"""Decode-loop microbench (large-v3 geometry, real TPU).

Measures per-step decode time across cache/precision variants to
attribute the per-step budget: cross-KV dtype, self-KV dtype, alignment
capture on/off. Complements scripts/enc_bench.py.

Usage: python scripts/dec_bench.py [batch] [n_tokens]
Env: VARIANTS comma list of names below (default all), ITERS,
W ("int8"|"int4"|"bf16" decoder weight quantization).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import (GenerationOptions, SpecialTokens,
                                       WhisperArch)
from crisperwhisper_tpu.decoding.greedy import greedy_decode_jit
from crisperwhisper_tpu.decoding.processors import suppress_tokens_mask
from crisperwhisper_tpu.models import alignment_selector, init_params
from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                quantize_decoder_weights)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ITERS = int(os.environ.get("ITERS", "3"))

VARIANTS = {
    # name: (cross_dtype, self_dtype, align?)
    "cross=int4 self=bf16 align": (jnp.int4, None, True),
    "cross=int4 self=int8 align": (jnp.int4, jnp.int8, True),
    "cross=int4 self=int4 align": (jnp.int4, jnp.int4, True),
    "cross=int8 self=int8 align": (jnp.int8, jnp.int8, True),
    "cross=int4 self=int8 NOALIGN": (jnp.int4, jnp.int8, False),
    "cross=bf16 self=bf16 align": (None, None, True),
}


def main():
    arch = WhisperArch.large_v3()
    sp = SpecialTokens()
    params = init_params(arch, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    w_bits = {"int8": 8, "int4": 4, "bf16": 0}[os.environ.get("W", "int8")]
    if w_bits:
        params = quantize_decoder_weights(
            fuse_decoder_qkv(params, arch.head_dim), bits=w_bits)
    heads = tuple(((2 + 2 * i) % arch.decoder_layers,
                   i % arch.decoder_attention_heads) for i in range(15))
    align_sel = jnp.asarray(alignment_selector(arch, heads))
    suppress = jnp.asarray(suppress_tokens_mask(arch.vocab_size, (sp.eot,)))
    opts = GenerationOptions(max_initial_timestamp_index=50)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal(
        (B, arch.max_source_positions, arch.d_model)).astype(np.float32)
        * 0.05, jnp.bfloat16)
    prompt = jnp.full((B, 1), sp.sot, jnp.int32)

    names = os.environ.get("VARIANTS")
    names = names.split(",") if names else list(VARIANTS)
    for name in names:
        cross, self_dt, align = VARIANTS[name]

        def run():
            res = greedy_decode_jit(
                params, arch, sp, opts, enc, prompt, N_TOKENS,
                suppress_mask=suppress,
                align_sel=align_sel if align else None,
                align_dtype=jnp.bfloat16,
                cross_cache_dtype=cross, self_cache_dtype=self_dt)
            return np.asarray(res.sequences)[0, 0]   # host sync

        run()                                        # compile + warm
        t0 = time.perf_counter()
        for _ in range(ITERS):
            run()
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:32s} {dt:7.3f} s  = {dt / N_TOKENS * 1e3:6.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
