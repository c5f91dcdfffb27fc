"""Fused alignment preprocessing kernel: z-norm + median + head-mean.

The XLA chain in ops/alignment.attention_to_jump_times re-reads the
[B, A, T, K] f32 attention stack several times (token-axis statistics,
7 shifted copies for the median window, head mean) — measured ~0.45 s per
64-chunk batch on v5e, ~8x the DTW DP itself. This kernel does the whole
prep in ONE pass per (batch, head) block: statistics, normalization, the
7-tap median (sorting network over lane-rolled copies) and the running
head-mean accumulation all stay in VMEM.

Scope: full-key-width windows only (n_frames == K for every row — the
common case: every non-final 30 s chunk). The dynamic reflect boundary at
a cropped n_frames needs per-column lane gathers that Mosaic cannot lower;
callers fall back to the XLA path for batches containing cropped rows
(ops/alignment.attention_to_jump_times handles the dispatch).

Token masking (true generated count per row) IS handled — rows beyond
n_tokens are excluded from the statistics, like znorm_tokens' mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _median_of(cols: list[jax.Array]) -> jax.Array:
    """Elementwise median of N equal-shape arrays via an exchange sort
    network — all compares stay in registers on the VPU."""
    xs = list(cols)
    n = len(xs)
    for i in range(n):
        for j in range(n - 1 - i):
            lo = jnp.minimum(xs[j], xs[j + 1])
            hi = jnp.maximum(xs[j], xs[j + 1])
            xs[j], xs[j + 1] = lo, hi
    return xs[n // 2]


def _kernel(nt_ref, w_ref, out_ref, *, n_heads: int, width: int):
    item = pl.program_id(0)
    head = pl.program_id(1)
    nt = nt_ref[item]
    x = w_ref[0, 0].astype(jnp.float32)                # [T, K]
    t = x.shape[0]

    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    tok_mask = (row < nt).astype(jnp.float32)
    count = jnp.maximum(nt.astype(jnp.float32), 1.0)
    mean = jnp.sum(x * tok_mask, axis=0, keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * tok_mask, axis=0,
                  keepdims=True) / count
    z = (x - mean) / jnp.maximum(jnp.sqrt(var), 1e-10)

    @pl.when(head == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # 7-tap median along lanes with reflect at [0, K-1]: build the shifted
    # copies with circular rolls, then patch the (static) edge columns.
    # The median stage runs in STATIC ROW CHUNKS: the taps roll along the
    # lane (key) axis only, so token rows are independent — chunking keeps
    # the 7 shifted copies + sort temporaries bounded (~width * chunk * K
    # floats) instead of scaling with T, which blows the 16M scoped-VMEM
    # limit at T=256 (7+ full [256, 1536] f32 temps).
    pad = width // 2
    k = z.shape[1]
    chunk = min(t, 64)

    for t0 in range(0, t, chunk):
        zc = z[t0:t0 + chunk]                          # [chunk, K]
        col = jax.lax.broadcasted_iota(jnp.int32, zc.shape, 1)

        def patch(s, j, src, zc=zc, col=col):
            return jnp.where(col == j,
                             jnp.broadcast_to(zc[:, src:src + 1], zc.shape),
                             s)

        shifted = []
        for off in range(-pad, pad + 1):
            # roll shift must be non-negative: left-shift off == roll K-off
            s = pltpu.roll(zc, (-off) % k, 1)  # s[:, j] = zc[:, j+off]
            if off < 0:
                for j in range(-off):          # reflect at 0: z[-(j+off)]
                    s = patch(s, j, -(j + off))
            elif off > 0:
                for j in range(k - off, k):    # reflect at K-1: z[2K-2-j-off]
                    s = patch(s, j, 2 * k - 2 - j - off)
            shifted.append(s)
        med = _median_of(shifted)
        # negated head-mean (DTW cost)
        out_ref[0, t0:t0 + chunk] += med * (-1.0 / n_heads)


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def fused_align_prep(weights: jax.Array, n_tokens: jax.Array,
                     width: int = 7, interpret: bool = False) -> jax.Array:
    """[B, A, T, K] attention + [B] token counts -> [B, T, K] f32 negated
    smoothed matrix (the DTW cost input), full-key-width case."""
    b, a, t, k = weights.shape
    return pl.pallas_call(
        functools.partial(_kernel, n_heads=a, width=width),
        out_shape=jax.ShapeDtypeStruct((b, t, k), jnp.float32),
        grid=(b, a),
        in_specs=[
            pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, t, k), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, k), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(n_tokens.astype(jnp.int32), weights)
