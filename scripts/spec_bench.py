"""Assisted-decoding mechanism microbench (large-v3 + distil-style draft).

Random weights make end-to-end acceptance meaningless, so this measures
the MECHANISM's on-device costs honestly and reports the resulting
committed-tokens/s as a function of acceptance:

  * t_step    — main-model single-token step (the greedy baseline)
  * t_verify  — main-model S-token verify block (decode_step_multi):
                the cross-KV cache (decode's dominant HBM read) is read
                once per WINDOW here, so t_verify << S * t_step
  * t_draft   — draft single-token step (distil-large-v3 geometry:
                2 decoder layers, same width — the published assistant
                for large-v3)
  * assisted wall-clock per window measured end-to-end with a
    same-params draft (acceptance ~1) and a garbage draft (acceptance ~0)

Modeled tokens/s at acceptance a: window commits E = 1 + a*(S-1) tokens
for cost S*t_draft + t_verify; greedy baseline = 1/t_step.

Usage: python scripts/spec_bench.py [spec_len] [n_tokens]
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import (GenerationOptions, SpecialTokens,
                                       WhisperArch)
from crisperwhisper_tpu.decoding import assisted_decode_jit, greedy_decode_jit
from crisperwhisper_tpu.models import init_cache, init_params
from crisperwhisper_tpu.models.whisper import decode_step, decode_step_multi

S = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ITERS = int(os.environ.get("ITERS", "5"))


def timeit(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[0], out)   # sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x).ravel()[0], out)
    return (time.perf_counter() - t0) / ITERS


def main():
    arch = WhisperArch.large_v3()
    draft_arch = dataclasses.replace(arch, decoder_layers=2)
    sp = SpecialTokens()
    params = init_params(arch, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    draft = init_params(draft_arch, jax.random.PRNGKey(1),
                        dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal(
        (1, arch.max_source_positions, arch.d_model)).astype(np.float32)
        * 0.05, jnp.bfloat16)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    prompt = jnp.full((1, 1), sp.sot, jnp.int32)

    # component costs
    cache = init_cache(params, arch, enc, cache_len=N_TOKENS + S + 1,
                       cross_dtype=jnp.int8)
    tok = jnp.full((1,), sp.sot, jnp.int32)
    blk = jnp.full((1, S), sp.sot, jnp.int32)
    # params passed as ARGS, not closed over: closing over large-v3
    # params embeds multi-GB constants in the program, and the axon
    # remote-compile upload dies with "Broken pipe" on payloads that big
    step_fn = jax.jit(lambda p, t, c: decode_step(p, arch, t,
                                                  jnp.int32(1), c)[0])
    multi_fn = jax.jit(lambda p, t, c: decode_step_multi(p, arch, t,
                                                         jnp.int32(1), c)[0])
    dcache = init_cache(draft, draft_arch, enc, cache_len=N_TOKENS + S + 1)
    dstep_fn = jax.jit(lambda p, t, c: decode_step(p, draft_arch, t,
                                                   jnp.int32(1), c)[0])
    t_step = timeit(step_fn, params, tok, cache)
    t_verify = timeit(multi_fn, params, blk, cache)
    t_draft = timeit(dstep_fn, draft, tok, dcache)
    print(f"t_step(main,1tok)   {t_step * 1e3:7.2f} ms")
    print(f"t_verify(main,{S}tok) {t_verify * 1e3:7.2f} ms  "
          f"({t_verify / t_step:.2f}x one step for {S} positions)")
    print(f"t_draft(2L,1tok)    {t_draft * 1e3:7.2f} ms")
    for a in (0.0, 0.5, 0.8, 1.0):
        e = 1 + a * (S - 1)
        tps = e / (S * t_draft + t_verify)
        print(f"  modeled tokens/s @accept={a:.1f}: {tps:7.1f} "
              f"(greedy {1 / t_step:.1f})")

    # end-to-end: same-params draft (upper acceptance) vs garbage draft
    def run(dp, da, de):
        res = assisted_decode_jit(params, arch, dp, da, sp, opts, enc, de,
                                  prompt, N_TOKENS, spec_len=S,
                                  cross_cache_dtype=jnp.int8)
        return res.sequences

    t_same = timeit(lambda: run(params, arch, enc))
    t_garb = timeit(lambda: run(draft, draft_arch, enc))
    g = jax.jit(lambda p, e: greedy_decode_jit(
        p, arch, sp, opts, e, prompt, N_TOKENS,
        cross_cache_dtype=jnp.int8).sequences)
    t_greedy = timeit(g, params, enc)
    print(f"e2e {N_TOKENS} tokens: greedy {t_greedy:.3f}s | assisted "
          f"same-draft {t_same:.3f}s | garbage-draft {t_garb:.3f}s")


if __name__ == "__main__":
    main()
