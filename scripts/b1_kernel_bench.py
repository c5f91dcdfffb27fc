"""B=1 whole-step Pallas decoder kernel vs the XLA decode_step (real TPU).

Times N chained decode steps inside ONE jitted fori_loop per variant
(axon per-dispatch tunnel latency must be amortized — NOTES_ROUND2.md),
at large-v3 geometry, int8 weights (fused qkv), int8 self ring,
int4/int8 cross cache.

Usage: python scripts/b1_kernel_bench.py [n_steps]
Env: ITERS (default 3), RING (default 384), CROSS (int4|int8, default
int4), VARIANTS ("xla,kernel").
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import WhisperArch
from crisperwhisper_tpu.models import (alignment_selector, decode_step,
                                       init_cache, init_params)
from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                quantize_decoder_weights)
from crisperwhisper_tpu.ops.pallas_decode_b1 import decode_step_b1

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(os.environ.get("ITERS", "3"))
RING = int(os.environ.get("RING", "384"))
CROSS = os.environ.get("CROSS", "int4")
VARIANTS = os.environ.get("VARIANTS", "xla,kernel").split(",")


def main():
    arch = WhisperArch.large_v3()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0),
                                     dtype=jnp.bfloat16), arch.head_dim))
    # decoder-only weights needed; drop the encoder to save HBM
    params = {"decoder": params["decoder"]}
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, arch.max_source_positions, arch.d_model)).astype(np.float32),
        jnp.bfloat16)
    cross_dtype = jnp.int4 if CROSS == "int4" else jnp.int8
    cache0 = init_cache(params, arch, enc, cross_dtype=cross_dtype,
                        cache_len=RING, self_dtype=jnp.int8)
    sel = jnp.asarray(alignment_selector(
        arch, ((1, 0), (2, 1), (3, 2), (5, 4))))

    def loop(step_fn):
        @jax.jit
        def run(cache, tok0):
            def body(i, carry):
                tok, cache, acc = carry
                logits, cache, align = step_fn(params, arch, tok, i, cache,
                                               align_sel=sel)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, cache, acc + align.sum())
            tok, cache, acc = jax.lax.fori_loop(
                0, N, body, (tok0, cache, jnp.float32(0)))
            return tok, acc
        return run

    for name in VARIANTS:
        fn = loop(decode_step if name == "xla" else decode_step_b1)
        tok0 = jnp.asarray([7], jnp.int32)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(cache0, tok0))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(cache0, tok0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:8s} {best:7.3f} s = {best / N * 1e3:6.2f} ms/step "
              f"(compile {compile_s:.0f} s, tok {int(out[0][0])}, "
              f"acc {float(out[1]):.3e})", flush=True)


if __name__ == "__main__":
    main()
