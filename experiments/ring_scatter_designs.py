"""Per-row ring-write strategies at large-v3 serving geometry (real TPU).

Round 3 pinned batched speculation's loss (0.86x at B=64 even at
acceptance 1.0) on the vector-position cache writes lowering to XLA
scatters (NOTES_ROUND3.md item 2). ops/ring_scatter.py now carries
three bit-identical strategies; this measures the WRITE OP in isolation
(chained in one fori_loop, rings donated, positions varied per
iteration so nothing constant-folds), then the in-context number comes
from `CW_RING_SCATTER=<mode> python scripts/spec_accept_bench.py 64`
(round-3 lesson: isolated ring microbenches can invert in-context
rankings — the capture script runs both).

Geometry: rings [L=32, B=64, h=20, dh=64, T=384] int8 + bf16 scales,
verify-block S=5 — one layer's writes per iteration (the scan body's
unit of work).

Usage: python experiments/ring_scatter_designs.py
Env: ITERS (default 3), N (chained writes per measurement, default 256),
     MODES ("scatter,dus,dma").

Verdict (to be filled from the TPU capture):
  - pending tunnel; see BENCH_r03 capture log step 5.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PLATFORM"):    # the axon plugin overrides JAX_PLATFORMS;
    jax.config.update("jax_platforms", os.environ["PLATFORM"])  # this wins

import jax.numpy as jnp

from crisperwhisper_tpu.ops.ring_scatter import write_block_columns_group

L, B, H, DH, T, S = 32, 64, 20, 64, 384, 5
N = int(os.environ.get("N", "256"))
ITERS = int(os.environ.get("ITERS", "3"))
MODES = os.environ.get("MODES", "scatter,dus,dma").split(",")


def main():
    key = jax.random.PRNGKey(0)
    ring_k = jax.random.randint(key, (L, B, H, DH, T), -127, 128, jnp.int8)
    ring_v = ring_k + 1
    ring_ks = jnp.ones((L, B, H, T), jnp.bfloat16) * 0.01
    ring_vs = ring_ks * 2
    blk = jax.random.randint(key, (B, H, DH, S), -127, 128, jnp.int8)
    blk_s = jnp.ones((B, H, S), jnp.bfloat16) * 0.02

    for mode in MODES:
        def chained(rk, rv, rks, rvs, pos0):
            def body(i, carry):
                rk, rv, rks, rvs = carry
                # positions drift per iteration: stay in-bounds, per-row
                pos = (pos0 + i * 3) % (T - S)
                li = i % L
                rk, rv, rks, rvs = write_block_columns_group(
                    [(rk, blk), (rv, blk), (rks, blk_s), (rvs, blk_s)],
                    li, pos, mode=mode)
                return (rk, rv, rks, rvs)
            return jax.lax.fori_loop(0, N, body, (rk, rv, rks, rvs))

        fn = jax.jit(chained, donate_argnums=(0, 1, 2, 3))
        pos0 = jnp.arange(B, dtype=jnp.int32) % (T - S)
        args = lambda: (ring_k + 0, ring_v + 0, ring_ks + 0,  # noqa: E731
                        ring_vs + 0, pos0)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args()))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(ITERS):
            a = jax.block_until_ready(args())
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        del out
        print(f"{mode:8s} {best / N * 1e3:7.3f} ms/layer-write "
              f"(x32 layers = {best / N * 32 * 1e3:6.2f} ms/block-step; "
              f"compile {compile_s:.0f} s)", flush=True)


if __name__ == "__main__":
    main()
