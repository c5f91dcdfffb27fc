"""Benchmark: chunked-transcription throughput (RTFx) on the flagship
large-v3 geometry, single chip.

Measures the real serving hot path for 30 s chunks end to end on device:
log-mel frontend -> encoder -> KV-cached greedy decode with timestamp
grammar + in-graph alignment capture -> DTW token alignment. EOS is
suppressed so every chunk decodes exactly DECODE_TOKENS tokens — a fixed,
generous token budget (real 30 s speech is ~70-120 tokens) making RTFx
comparable across runs regardless of random-weight behavior.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = RTFx / 200 (driver target: >=200x per v5e chip,
BASELINE.json:5).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crisperwhisper_tpu.config import (FeatureConfig, GenerationOptions,
                                       SpecialTokens, WhisperArch)
from crisperwhisper_tpu.audio.mel import log_mel_spectrogram
from crisperwhisper_tpu.decoding.greedy import greedy_decode_jit
from crisperwhisper_tpu.decoding.processors import suppress_tokens_mask
from crisperwhisper_tpu.models import (alignment_selector, encode,
                                       init_params)
from crisperwhisper_tpu.ops.alignment import attention_to_jump_times

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
DECODE_TOKENS = int(os.environ.get("BENCH_TOKENS", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "4"))
N_ALIGN_HEADS = 15     # CrisperWhisper fine-tunes 15 heads (README:295)
KV_INT8 = os.environ.get("BENCH_KV_INT8", "1") == "1"
W_INT8 = os.environ.get("BENCH_W_INT8", "1") == "1"


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    arch = WhisperArch.large_v3() if on_tpu else WhisperArch.tiny()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    sp = SpecialTokens()   # standard multilingual layout (51866 fits v3)
    feat_cfg = FeatureConfig(feature_size=arch.num_mel_bins)

    params = init_params(arch, jax.random.PRNGKey(0), dtype=dtype)
    if W_INT8 and on_tpu:
        from crisperwhisper_tpu.models.quantize import (
            fuse_decoder_qkv, quantize_decoder_weights)
        params = quantize_decoder_weights(
            fuse_decoder_qkv(params, arch.head_dim))
    heads = tuple((2 + 2 * i, i % arch.decoder_attention_heads)
                  for i in range(N_ALIGN_HEADS))
    align_sel = jnp.asarray(alignment_selector(arch, heads))
    # force fixed-length decode: suppress eot so no row finishes early
    suppress = jnp.asarray(suppress_tokens_mask(arch.vocab_size, (sp.eot,)))
    opts = GenerationOptions(max_initial_timestamp_index=50)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (BATCH, feat_cfg.n_samples)).astype(np.float32) * 0.1)
    prompt = jnp.full((BATCH, 1), sp.sot, jnp.int32)

    # three separate programs (mel+encode / decode / DTW), exactly like the
    # serving pipeline — one fused program would make the peak HBM usage
    # the UNION of all stages' buffers and OOM at larger batches
    enc_fn = jax.jit(lambda p, a: encode(
        p, arch, log_mel_spectrogram(a, feat_cfg, dtype=dtype)))

    def run(params, audio):
        enc = enc_fn(params, audio)
        res = greedy_decode_jit(
            params, arch, sp, opts, enc, prompt, DECODE_TOKENS,
            suppress_mask=suppress, align_sel=align_sel,
            align_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            cross_cache_dtype=jnp.int8 if (KV_INT8 and on_tpu) else None)
        jumps = attention_to_jump_times(
            res.align_probs.astype(jnp.float32), 7,
            jnp.maximum(res.num_generated - 1, 0),
            jnp.full((BATCH,), arch.max_source_positions, jnp.int32),
            full_frames=on_tpu)
        return res.sequences, jumps

    def materialize(out):
        # block_until_ready is unreliable under the axon tunnel; a small
        # host readback of both outputs forces the full chain.
        seqs, jumps = out
        return np.asarray(seqs)[0, 0] + np.asarray(jumps)[0, 0]

    # warmup / compile
    materialize(run(params, audio))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        materialize(run(params, audio))
    elapsed = time.perf_counter() - t0

    audio_seconds = BATCH * feat_cfg.chunk_length * ITERS
    rtfx = audio_seconds / elapsed
    print(json.dumps({
        "metric": f"RTFx {('large-v3' if on_tpu else 'tiny-cpu')} 30s-chunk "
                  f"pipeline (mel+enc+{DECODE_TOKENS}tok-decode+DTW), "
                  f"batch={BATCH}",
        "value": round(rtfx, 2),
        "unit": "x realtime per chip",
        "vs_baseline": round(rtfx / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
