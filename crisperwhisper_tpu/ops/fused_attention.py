"""Fused multi-head attention Pallas kernel for the encoder.

The XLA-default encoder self-attention materializes the [B, H, 1500, 1500]
score tensor in HBM (several GB of traffic per layer at B=16). Whisper's
K/V per (batch, head) is tiny — 1536x64 bf16 = 200 KB — so the whole
K/V plus a score block fit comfortably in VMEM: this kernel keeps scores
on-chip entirely, one MXU pass for Q@K^T and one for P@V per (bh, q-block)
program. No online-softmax machinery is needed at this sequence length
(cf. flash attention); a full-width VMEM softmax is simpler and as fast.

Layout: kernel IO is [BH, Dh, T] — sequence on the 128-lane axis. The
natural [BH, T, 64] layout pads its 64-wide lane dim to 128, doubling the
HBM footprint and traffic of every kernel operand (the same pathology
fixed for the decoder KV caches; see models/whisper.DecoderCache).

Numerics: softmax in f32, same as the eager path (whisper applies the
1/sqrt(d) scale to Q before the matmul — callers pass Q pre-scaled, see
models/whisper.py attention()).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int,
                 fast_exp: str | None = None):
    q = q_ref[0]                                   # [Dh, bq]
    k = k_ref[0]                                   # [Dh, Tk_pad]
    v = v_ref[0]
    # s[q, t] = sum_d q[d, q] * k[d, t]
    s = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len < k.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    # softmax with the denominator FOLDED OUT of the [bq, Tk] pass: the
    # divide runs on the [Dh, bq] output instead (24x fewer lanes); the
    # f32 reassociation stays well inside the kernel's 2e-5 parity band
    m = jnp.max(s, axis=-1, keepdims=True)
    x = s - m
    # fast_exp: MEASUREMENT HOOKS, not serving paths. Round-3 sweep
    # (experiments/README.md "fast-exp sweep") showed the kernel is NOT
    # exp-bound — replacing exp with one multiply ("noexp") changes
    # nothing (12.8 vs 12.7 ms at B=64), bf16 exp is SLOWER (cast
    # round-trip), exp2 is bit-identical in cost. The ~30% MFU ceiling
    # is the Dh=64-vs-128-wide-MXU geometry. Exact f32 exp stays the
    # default; variants kept for reproducibility:
    if fast_exp == "bf16":
        e = jnp.exp(x.astype(jnp.bfloat16)).astype(jnp.float32)
    elif fast_exp == "exp2":
        e = jnp.exp2(x * jnp.float32(1.4426950408889634))
    elif fast_exp == "bf16_exp2":
        e = jnp.exp2((x * jnp.float32(1.4426950408889634))
                     .astype(jnp.bfloat16)).astype(jnp.float32)
    elif fast_exp == "noexp":
        # TIMING DIAGNOSTIC ONLY (wrong numerics): replaces the exp with
        # one multiply to measure how much of the kernel is actually
        # transcendental-bound
        e = x * jnp.float32(1e-4) + jnp.float32(1.0)
    else:
        e = jnp.exp(x)                             # [bq, Tk_pad]
    denom = jnp.sum(e, axis=-1)                    # [bq]
    # o[d, q] = (sum_t v[d, t] * e[q, t]) / denom[q]
    o = jax.lax.dot_general(v, e.astype(v.dtype), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom[None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "fast_exp"))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = 1536,
                    fast_exp: str | None = None) -> jax.Array:
    # block_q default: measured on v5e at large-v3 encoder geometry
    # (scripts/attn_tune.py, chained calls): 1536 (= whole padded
    # sequence, one q-block per (b, h) program) 12.4 ms vs 12.7 at 768
    # and 15.5 XLA eager; the [1536, 1536] f32 score block fits VMEM.
    # Parity band vs eager on TPU: ~3e-5 absolute at activation scale
    # 0.1 (was ~2e-5 at block 768) — an order of magnitude below the
    # bf16 resolution of the surrounding activations.
    """softmax(Q K^T) V with scores kept in VMEM.

    q: [B, H, Tq, D] (pre-scaled), k/v: [B, H, Tk, D]. Returns q-shaped.
    Sequence lengths are padded on-kernel to lane multiples; padded keys
    are masked, padded queries dropped on return.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    tk_pad = _round_up(tk, 128)
    # VMEM safety clamp: the kernel materializes a [block_q, Tk_pad] f32
    # score block plus a same-shape exp block in v.dtype. The 1536
    # default is tuned for large-v3 encoder geometry (Tk_pad=1536) where
    # that sum is ~14 MiB; for longer Tk (or smaller scoped-VMEM
    # backends) shrink block_q so the blocks still fit instead of
    # failing to compile.
    per_q_bytes = tk_pad * (4 + jnp.dtype(v.dtype).itemsize)
    max_bq = max(128, (14 * 1024 * 1024 // per_q_bytes) // 128 * 128)
    block_q = min(block_q, max_bq)
    tq_pad = _round_up(tq, block_q)

    def to_dt(x, t_pad):          # [B, H, T, D] -> [BH, D, T_pad]
        x = jnp.swapaxes(x, -1, -2).reshape(b * h, d, x.shape[2])
        if t_pad != x.shape[-1]:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - x.shape[-1])))
        return x

    qf = to_dt(q, tq_pad)
    kf = to_dt(k, tk_pad)
    vf = to_dt(v, tk_pad)

    grid = (b * h, tq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, kv_len=tk, fast_exp=fast_exp),
        out_shape=jax.ShapeDtypeStruct((b * h, d, tq_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tk_pad), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tk_pad), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda bh, qb: (bh, 0, qb),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq_pad * tk_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * tq_pad * tk_pad,
        ),
    )(qf, kf, vf)
    # [BH, D, Tq_pad] -> [B, H, Tq, D]
    out = out[:, :, :tq].reshape(b, h, d, tq)
    return jnp.swapaxes(out, -1, -2)


def supports_pallas() -> bool:
    """True when running on a real TPU backend (Mosaic lowering)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")
