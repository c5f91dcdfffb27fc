"""Beam-search decode throughput on the real chip (BASELINE config 4).

The beam path's perf scenario — beam=5 with the temperature-fallback
ladder's hallucination gates downstream — has correctness parity tests
(tests/test_beam.py, tests/test_beam_fallback_e2e.py) but no measured
number; this script publishes one. Times mel+encoder+beam-5 decode with
in-graph alignment capture at large-v3 geometry, chained ITERS times
per measurement (axon per-dispatch tunnel latency — NOTES_ROUND2.md).

Usage: python scripts/beam_bench.py [batch] [n_tokens]
Env: ITERS (default 3), BEAMS (default 5), CROSS (int4|int8, default
int4), SELF (bf16|int8|int4 self ring, default bf16), STAGED (staged
ring-growth quantum, default GenerationOptions default = 64; 0 = one
full-width loop) — the round-5 beam-shape A/B knobs.
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

from crisperwhisper_tpu.audio.mel import log_mel_spectrogram
from crisperwhisper_tpu.config import (FeatureConfig, GenerationOptions,
                                       SpecialTokens, WhisperArch)
from crisperwhisper_tpu.decoding.beam import beam_decode_jit
from crisperwhisper_tpu.decoding.generate import suppress_tokens_mask
from crisperwhisper_tpu.models import (alignment_selector, encode,
                                       init_params)
from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                quantize_decoder_weights)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 192
ITERS = int(os.environ.get("ITERS", "3"))
BEAMS = int(os.environ.get("BEAMS", "5"))
CROSS = os.environ.get("CROSS", "int4")
SELF = os.environ.get("SELF", "bf16")
STAGED = os.environ.get("STAGED")


def main():
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    arch = WhisperArch.large_v3() if on_tpu else WhisperArch.tiny()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    sp = SpecialTokens()
    feat_cfg = FeatureConfig(feature_size=arch.num_mel_bins)
    cross_dtype = ({"int8": jnp.int8, "int4": jnp.int4}.get(CROSS)
                   if on_tpu else None)
    self_dtype = ({"int8": jnp.int8, "int4": jnp.int4}.get(SELF)
                  if on_tpu else None)

    params = init_params(arch, jax.random.PRNGKey(0), dtype=dtype)
    if on_tpu:
        params = quantize_decoder_weights(
            fuse_decoder_qkv(params, arch.head_dim))
    heads = tuple(((2 + 2 * i) % arch.decoder_layers,
                   i % arch.decoder_attention_heads) for i in range(7))
    align_sel = jnp.asarray(alignment_selector(arch, heads))
    # fixed-length decode for comparability: no row finishes early
    suppress = jnp.asarray(suppress_tokens_mask(arch.vocab_size, (sp.eot,)))
    opts = GenerationOptions(max_initial_timestamp_index=50)
    if STAGED is not None:
        from dataclasses import replace
        opts = replace(opts, staged_ring_quantum=int(STAGED))

    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, feat_cfg.n_samples)).astype(np.float32) * 0.1)
    enc_fn = jax.jit(lambda p, a: encode(
        p, arch, log_mel_spectrogram(a, feat_cfg, dtype=dtype)))

    def run(params, audio):
        enc = enc_fn(params, audio)
        prompt = jnp.full((BATCH, 1), sp.sot, jnp.int32)
        res = beam_decode_jit(
            params, arch, sp, opts, enc, prompt, N_TOKENS, BEAMS,
            suppress_mask=suppress, align_sel=align_sel,
            align_dtype=dtype, cross_cache_dtype=cross_dtype,
            self_cache_dtype=self_dtype)
        return res.sequences

    t0 = time.perf_counter()
    np.asarray(run(params, audio))                       # compile
    print(f"# compile: {time.perf_counter() - t0:.0f} s", flush=True)
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(run(params, audio))
        best = min(best, time.perf_counter() - t0)
    audio_seconds = BATCH * feat_cfg.chunk_length
    print(json.dumps({
        "mode": "beam_search", "batch": BATCH, "num_beams": BEAMS,
        "tokens_per_chunk": N_TOKENS, "kv": CROSS, "self_kv": SELF,
        "staged": opts.staged_ring_quantum,
        "device_s": round(best, 3),
        "rtfx_device": round(audio_seconds / best, 1)}), flush=True)


if __name__ == "__main__":
    main()
