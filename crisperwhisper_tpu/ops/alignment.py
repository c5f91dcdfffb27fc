"""Token-to-time alignment ops: z-norm, median filter, and DTW.

Parity contracts (golden-tested against the reference implementations):
  * median filter  — hf generation_whisper.py:46-64 (_median_filter):
    reflect-padded sliding median along the frame axis.
  * z-normalize    — hf generation_whisper.py:344-349: per (head, frame)
    mean/std over the *token* axis, std unbiased=False.
  * DTW            — hf generation_whisper.py:67-118 (_dynamic_time_warping):
    monotonic alignment DP over the negative attention matrix with the
    reference's exact tie-breaking (diagonal only on strict <, else up only
    on strict <, else left).

TPU design: the reference's DTW is a pure-Python O(T x 1500) loop with a
forced device->host sync (generation_whisper.py:370). Here the DP runs as a
`lax.scan` over anti-diagonals of a pre-sheared cost matrix — each scan
step is one vectorized min over a [T]-wide slice, the arithmetic order per
cell is identical to the reference's scalar loop (one add + 3-way min), and
everything stays on device. The backtrace is a bounded `fori_loop` over the
int8 trace matrix. Variable true lengths (tokens generated, frames of real
audio) are handled by masking, keeping shapes static under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(jnp.inf)


# ---------------------------------------------------------------------------
# median filter (dynamic reflect boundary)
# ---------------------------------------------------------------------------


def median_filter(x: jax.Array, width: int,
                  length: jax.Array | None = None) -> jax.Array:
    """Sliding median along the last axis with reflect padding.

    Args:
      x: [..., M] float array.
      width: odd static filter width.
      length: optional scalar — true length M' <= M; reflection happens at
        the M' boundary (matches the reference cropping weights to
        num_frames//2 *before* filtering, generation_whisper.py:313-332).
        Columns >= M' are passed through untouched.
    """
    if width <= 0 or width % 2 != 1:
        raise ValueError("`width` should be an odd positive number")
    m = x.shape[-1]
    pad = width // 2
    if m <= pad:
        return x
    n = length if length is not None else m
    j = jnp.arange(m)
    cols = []
    for off in range(-pad, pad + 1):
        idx = j + off
        idx = jnp.where(idx < 0, -idx, idx)               # reflect at 0
        idx = jnp.where(idx >= n, 2 * n - 2 - idx, idx)   # reflect at n-1
        idx = jnp.clip(idx, 0, m - 1)
        cols.append(jnp.take(x, idx, axis=-1))
    window = jnp.stack(cols, axis=-1)                     # [..., M, width]
    med = jnp.sort(window, axis=-1)[..., pad]
    if length is not None:
        med = jnp.where(j < n, med, x)
    return med


def znorm_tokens(weights: jax.Array, token_mask: jax.Array | None = None
                 ) -> jax.Array:
    """Normalize over the token axis (axis=-2), std unbiased=False.

    weights: [..., T, M]; token_mask: [..., T] bool marking real tokens.
    Masked-out token rows do not contribute to the statistics.
    """
    if token_mask is None:
        mean = jnp.mean(weights, axis=-2, keepdims=True)
        std = jnp.std(weights, axis=-2, keepdims=True)
    else:
        mask = token_mask[..., :, None].astype(weights.dtype)
        count = jnp.maximum(jnp.sum(mask, axis=-2, keepdims=True), 1.0)
        mean = jnp.sum(weights * mask, axis=-2, keepdims=True) / count
        var = jnp.sum(jnp.square(weights - mean) * mask, axis=-2,
                      keepdims=True) / count
        std = jnp.sqrt(var)
    return (weights - mean) / jnp.maximum(std, 1e-10)


# ---------------------------------------------------------------------------
# DTW: anti-diagonal wavefront DP + trace backtrace
# ---------------------------------------------------------------------------


def _shear(matrix: jax.Array, n: int, m: int) -> jax.Array:
    """[N, M] -> [N, N+M] with row i shifted right by i, inf elsewhere.

    After shearing, anti-diagonal d of the DP (cells (i, j=d-i)) is the
    column d of the sheared matrix."""
    pad = jnp.full((n, n), _INF, matrix.dtype)
    wide = jnp.concatenate([matrix, pad], axis=1)         # [N, M+N]
    idx = (jnp.arange(n + m)[None, :] - jnp.arange(n)[:, None]) % (n + m)
    return jnp.take_along_axis(wide, idx, axis=1)


def dtw_trace(matrix: jax.Array) -> jax.Array:
    """DP over cost matrix, returning the int8 trace [N+1, M+1].

    matrix: [N, M] f32 — the *negated* smoothed attention (cost).
    Trace codes match the reference: 0 diagonal, 1 up (token-1), 2 left
    (time-1); computed with the exact tie-break of
    generation_whisper.py:82-90.
    """
    n, m = matrix.shape
    sheared = _shear(matrix.astype(jnp.float32), n, m)    # [N, N+M]

    # carries: previous two anti-diagonals of the cost matrix, stored as
    # cost over token rows i=0..N (length N+1, row 0 = DP boundary row).
    # cost_d[i] = cost[i, d - i] in DP coordinates (both 1-based in ref).
    init = jnp.full((n + 1,), _INF)
    cost_d2 = init.at[0].set(0.0)                         # diagonal d=0: cost[0,0]
    cost_d1 = jnp.full((n + 1,), _INF)                    # diagonal d=1 boundary:
    # cells on diagonal d=1: (0,1)=inf, (1,0)=inf -> all inf.

    i_idx = jnp.arange(n + 1)

    def step(carry, col):
        cost_d1, cost_d2 = carry
        # computing diagonal d (cells (i, j=d-i) for 1<=i<=N, 1<=j<=M):
        # c0 = cost[i-1, j-1] -> cost_d2[i-1]
        # c1 = cost[i-1, j]   -> cost_d1[i-1]
        # c2 = cost[i, j-1]   -> cost_d1[i]
        c0 = jnp.concatenate([jnp.array([_INF]), cost_d2[:-1]])
        c1 = jnp.concatenate([jnp.array([_INF]), cost_d1[:-1]])
        c2 = cost_d1
        # reference tie-break: t=0 iff c0<c1 and c0<c2; t=1 iff c1<c0 and
        # c1<c2; else t=2.
        take0 = (c0 < c1) & (c0 < c2)
        take1 = (c1 < c0) & (c1 < c2)
        c = jnp.where(take0, c0, jnp.where(take1, c1, c2))
        t = jnp.where(take0, 0, jnp.where(take1, 1, 2)).astype(jnp.int8)
        # matrix value m[i-1, j-1] on this diagonal: sheared[i-1, d-1] where
        # col = sheared[:, d-1] already; align to i index (row i uses col[i-1])
        mval = jnp.concatenate([jnp.array([_INF]), col])
        new_cost = mval + c
        # row 0 stays boundary
        new_cost = new_cost.at[0].set(_INF)
        valid = i_idx >= 1          # i ranges 1..N on interior
        new_cost = jnp.where(valid, new_cost, _INF)
        return (new_cost, cost_d1), (new_cost, t)

    # scan over interior diagonals d = 2 .. N+M: step s computes d = s+2,
    # whose matrix values live in sheared column s (= d-2, since the m-diag
    # of cell (i,j) is (i-1)+(j-1)).
    (_, _), (costs, traces) = jax.lax.scan(
        step, (cost_d1, cost_d2), jnp.swapaxes(sheared, 0, 1)[:n + m - 1])
    del costs

    # unshear traces [N+M-1, N+1] -> trace[i, j]: traces[d-2, i] = trace[i, d-i]
    # => trace[i, j] = traces[i+j-2, i]
    trace = jnp.full((n + 1, m + 1), -1, jnp.int8)
    d_of = i_idx[:, None] + jnp.arange(m + 1)[None, :] - 2  # [N+1, M+1]
    gathered = traces[jnp.clip(d_of, 0, n + m - 2),
                      jnp.clip(i_idx[:, None], 0, n)]
    interior = (i_idx[:, None] >= 1) & (jnp.arange(m + 1)[None, :] >= 1)
    trace = jnp.where(interior, gathered, trace)
    # boundary rules used by the reference backtrace (:96-97)
    trace = trace.at[0, :].set(2)
    trace = trace.at[:, 0].set(1)
    return trace


def dtw_jump_times(matrix: jax.Array, n_tokens: jax.Array | None = None,
                   n_frames: jax.Array | None = None) -> jax.Array:
    """DTW + backtrace -> first-arrival time index per token row.

    Args:
      matrix: [N, M] f32 cost (negated attention). Rows >= n_tokens and
        columns >= n_frames must have been masked by the caller to +BIG so
        the path stays inside the true region (they are skipped by starting
        the backtrace at (n_tokens, n_frames)).
      n_tokens / n_frames: true lengths (default full).
    Returns:
      int32 [N] — time index of the first visit to each token row
      (time_indices[jumps] of the reference, :371-372); rows >= n_tokens
      hold the last valid value.
    """
    n, m = matrix.shape
    trace = dtw_trace(matrix)
    nt = jnp.asarray(n_tokens if n_tokens is not None else n, jnp.int32)
    nf = jnp.asarray(n_frames if n_frames is not None else m, jnp.int32)

    out0 = jnp.zeros((n,), jnp.int32)

    def body(_, state):
        i, j, out = state
        done = (i <= 0) & (j <= 0)
        t = trace[i, j]
        # record: visiting cell (i, j) corresponds to (token i-1, time j-1);
        # backward walk visits each row's cells in decreasing j, so the last
        # write per row is its first arrival.
        write = (~done) & (i >= 1)
        out = jnp.where(write, out.at[jnp.maximum(i - 1, 0)].set(
            jnp.maximum(j - 1, 0)), out)
        di = jnp.where((t == 0) | (t == 1), 1, 0)
        dj = jnp.where((t == 0) | (t == 2), 1, 0)
        i = jnp.where(done, i, i - di)
        j = jnp.where(done, j, j - dj)
        return i, j, out

    _, _, out = jax.lax.fori_loop(0, n + m, body, (nt, nf, out0))
    # pad tail rows with the last valid jump time (reference duplicates the
    # last timestamp for the token after the final generated one, :380-382)
    last = out[jnp.maximum(nt - 1, 0)]
    out = jnp.where(jnp.arange(n) < nt, out, last)
    return out


@functools.partial(jax.jit,
                   static_argnames=("median_width", "full_frames"))
def attention_to_jump_times(weights: jax.Array, median_width: int,
                            n_tokens: jax.Array, n_frames: jax.Array,
                            full_frames: bool = False) -> jax.Array:
    """Full alignment postprocess for one batch:
    [B, A, T, M] alignment-head cross-attention probabilities ->
    int32 [B, T] first-arrival frame index per generated token.

    Mirrors generation_whisper.py:344-383: z-norm over tokens, median
    filter over frames, mean over heads, DTW on the negated matrix.
    n_tokens: [B] true generated-token counts; n_frames: [B] true encoder
    frames (num_frames//2 cropping made dynamic).

    full_frames=True (a host-side promise that every n_frames == M, i.e.
    non-final 30 s chunks) routes the z-norm/median/mean prep through the
    fused Pallas kernel (ops/pallas_align.py) — one VMEM pass instead of
    the multi-pass XLA chain.
    """
    b, a, t, m = weights.shape
    token_mask = jnp.arange(t)[None, :] < n_tokens[:, None]        # [B, T]
    big = jnp.float32(1e9)

    if full_frames:
        from .fused_attention import supports_pallas
        if supports_pallas():
            from .pallas_align import fused_align_prep
            mats = fused_align_prep(weights, n_tokens, median_width)
            mats = jnp.where(token_mask[:, :, None], mats, big)
            return jax.vmap(lambda mat, nt: dtw_jump_times(mat, nt, m))(
                mats, n_tokens)

    frame_mask = jnp.arange(m)[None, :] < n_frames[:, None]        # [B, M]

    # token-axis chunking for the median filter: the single-call form
    # materializes the stacked sort window [B, A, T, M, width] — 15.4 GB
    # f32 at the B=96 serving shape (measured compile-stage OOM through
    # the product pipeline, round 5). Chunking T bounds the window to
    # [B, A, TC, M, width] (~1.3 GB) with identical results (the median
    # is independent per token row).
    _TC = 16

    def per_item(w, tmask, fmask, nt, nf):
        # [A, T, M]
        w = jnp.where(fmask[None, None, :], w, 0.0)
        w = znorm_tokens(w, jnp.broadcast_to(tmask, (a, t)))
        tc = min(_TC, t)
        t_pad = -(-t // tc) * tc
        wp = jnp.pad(w, ((0, 0), (0, t_pad - t), (0, 0)))
        wp = wp.reshape(a, t_pad // tc, tc, m).transpose(1, 0, 2, 3)
        wp = jax.lax.map(
            lambda c: median_filter(c, median_width, nf), wp)
        w = wp.transpose(1, 0, 2, 3).reshape(a, t_pad, m)[:, :t]
        mat = -jnp.mean(w, axis=0)                                 # [T, M]
        mat = jnp.where(tmask[:, None] & fmask[None, :], mat, big)
        return dtw_jump_times(mat, nt, nf)

    return jax.vmap(per_item)(weights, token_mask, frame_mask,
                              n_tokens, n_frames)
