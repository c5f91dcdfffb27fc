"""BASELINE.json config 5: multi-stream concurrent transcription.

The reference serves concurrent users through the Streamlit app, one
pipeline call per upload (ref:app.py:99-139 — each request runs the
whole HF pipeline; concurrency is whatever the web server interleaves).
Here N live streams share ONE device through the serving batcher
(`serving/batcher.py`): every stream's 30 s chunk windows land in a
global queue, the device-owner thread drains them into fixed-size
batches (one compiled program serves every batch), and a separate
finalizer thread stitches + delivers per-stream results.

Measures, for a burst of N concurrent streams of `DUR_S` seconds each:
  * aggregate RTFx  (total audio seconds / wall seconds)
  * time-to-first-stream-complete and per-stream completion latency
    (p50 / p95 / max)
against the direct sequential path (one pipeline call per stream) as
the no-batching baseline.

Comparability contract (same as bench.py): random weights, fixed
192-token decode budget per chunk — EOT plus every text id above the
byte range is suppressed, so the decode length is constant AND the
synthetic byte-level tokenizer (tokenizer/synthetic.py) can decode the
pipeline's real output end-to-end (stitcher + word grouping at
realistic cost, no id folding needed).

Usage: python scripts/live_streams_bench.py [N_STREAMS] [DUR_S]
(defaults 16 streams x 120 s; CPU fallback uses tiny geometry).
Env: BENCH_STREAM_BATCH (device batch, default 16), B1K=1 to route the
small-batch tail programs through the fused decode kernel.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PLATFORM"):    # the axon plugin overrides JAX_PLATFORMS;
    jax.config.update("jax_platforms", os.environ["PLATFORM"])  # this wins

import jax.numpy as jnp

from crisperwhisper_tpu.config import (FeatureConfig, GenerationOptions,
                                       PipelineOptions, SpecialTokens,
                                       WhisperArch)
from crisperwhisper_tpu.models import init_params
from crisperwhisper_tpu.pipeline.asr import ASRPipeline
from crisperwhisper_tpu.serving import StreamingBatcher
from crisperwhisper_tpu.tokenizer.synthetic import synthetic_standard_tokenizer

N_ALIGN_HEADS = 15
TOKENS_PER_CHUNK = 192


def build_pipeline(on_tpu: bool, batch_size: int) -> ASRPipeline:
    arch = WhisperArch.large_v3() if on_tpu else WhisperArch.tiny()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    sp = SpecialTokens()
    params = init_params(arch, jax.random.PRNGKey(0), dtype=dtype)
    if on_tpu:
        from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                        quantize_decoder_weights)
        params = quantize_decoder_weights(
            fuse_decoder_qkv(params, arch.head_dim), bits=8)
    heads = tuple(((2 + 2 * i) % arch.decoder_layers,
                   i % arch.decoder_attention_heads)
                  for i in range(N_ALIGN_HEADS if on_tpu else 2))
    # fixed-budget + byte-range-only text: every chunk decodes exactly
    # TOKENS_PER_CHUNK tokens and the synthetic tokenizer covers the ids
    # (suppress everything between the byte vocab and the timestamps:
    # text ids >= 256, EOT, and all control specials)
    suppress = tuple(range(256, sp.timestamp_begin))
    gen_opts = GenerationOptions(
        max_new_tokens=TOKENS_PER_CHUNK, alignment_heads=heads,
        suppress_tokens=suppress, temperatures=(0.0,),
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None, max_initial_timestamp_index=50,
        language="en", kv_cache_int4=on_tpu, self_kv_cache_int8=on_tpu,
        # one seek pass per 30 s chunk (hf force_unique semantics):
        # random weights end windows mid-segment and would re-decode the
        # remainder — fixed per-chunk work, same as bench.py's
        # pipeline_serving row
        force_unique_generate_call=True,
        # B1K=1: small-batch tail programs (2..8 rows) ride the fused
        # whole-step decode kernel (ops/pallas_decode_b1)
        b1_decode_kernel=os.environ.get("B1K", "0") == "1")
    feat_cfg = FeatureConfig(feature_size=arch.num_mel_bins)
    return ASRPipeline(
        params, arch, synthetic_standard_tokenizer(sp), specials=sp,
        gen_opts=gen_opts,
        pipe_opts=PipelineOptions(batch_size=batch_size,
                                  return_timestamps="word"),
        feat_cfg=feat_cfg)


def make_audio(n_streams: int, dur_s: float, sr: int = 16000):
    rng = np.random.default_rng(0)
    t = np.arange(int(dur_s * sr)) / sr
    return [(0.3 * np.sin(2 * np.pi * (200 + 30 * i) * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
            for i in range(n_streams)]


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dur_s = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    if not on_tpu:                              # CPU smoke geometry
        n_streams = min(n_streams, 3)
        dur_s = min(dur_s, 60.0)
    batch = int(os.environ.get("BENCH_STREAM_BATCH", "16" if on_tpu else "4"))

    pipe = build_pipeline(on_tpu, batch)
    streams = make_audio(n_streams, dur_s)
    inputs = [{"raw": a, "sampling_rate": 16000} for a in streams]

    # warm/compile: one direct call compiles the [batch]-shaped programs
    t0 = time.perf_counter()
    pipe(inputs[0], return_timestamps="word")
    print(f"# warm/compile: {time.perf_counter() - t0:.1f} s", flush=True)

    # ---- no-batching baseline: direct sequential pipeline calls -------
    t0 = time.perf_counter()
    for i, x in enumerate(inputs):
        pipe(x, return_timestamps="word")
        print(f"# sequential {i + 1}/{n_streams}: "
              f"{time.perf_counter() - t0:.1f} s cumulative", flush=True)
    seq_wall = time.perf_counter() - t0

    # ---- burst of N concurrent streams through the batcher ------------
    batcher = StreamingBatcher(pipe, warmup=True)   # all pow2 programs
    print(f"# warmup(all pow2): done at {time.perf_counter() - t0:.1f} s",
          flush=True)
    try:
        t0 = time.perf_counter()
        handles = [batcher.submit(x, return_timestamps="word")
                   for x in inputs]
        lat = []
        pending = list(enumerate(handles))
        while pending:
            for i, h in pending[:]:
                if h.done():
                    lat.append(time.perf_counter() - t0)
                    h.result(timeout=0)
                    pending.remove((i, h))
            time.sleep(0.005)
        wall = time.perf_counter() - t0
    finally:
        batcher.shutdown()

    lat.sort()
    total_audio = n_streams * dur_s
    row = {
        "mode": "live_streams_burst", "n_streams": n_streams,
        "stream_s": dur_s, "device_batch": batch,
        "tokens_per_chunk": TOKENS_PER_CHUNK,
        "wall_s": round(wall, 2),
        "rtfx_aggregate": round(total_audio / wall, 1),
        "first_stream_s": round(lat[0], 2),
        "stream_latency_p50_s": round(lat[len(lat) // 2], 2),
        "stream_latency_p95_s": round(lat[min(len(lat) - 1,
                                              int(len(lat) * 0.95))], 2),
        "stream_latency_max_s": round(lat[-1], 2),
        "sequential_wall_s": round(seq_wall, 2),
        "rtfx_sequential": round(total_audio / seq_wall, 1),
        "batching_speedup": round(seq_wall / wall, 2),
    }
    print(f"# row: {json.dumps(row)}", flush=True)
    print(json.dumps({
        "metric": f"live-streams aggregate RTFx ({n_streams} concurrent "
                  f"{dur_s:.0f}s streams, batcher batch={batch}, "
                  f"{'large-v3' if on_tpu else 'tiny-cpu'})",
        "value": row["rtfx_aggregate"], "unit": "x realtime per chip",
        "vs_baseline": row["batching_speedup"]}))


if __name__ == "__main__":
    main()
