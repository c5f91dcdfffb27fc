"""Fused multi-head attention Pallas kernel for the encoder.

The XLA-default encoder self-attention materializes the [B, H, 1500, 1500]
score tensor in HBM (several GB of traffic per layer at B=16). Whisper's
K/V per (batch, head) is tiny — 1536x64 bf16 = 200 KB — so the whole
K/V plus a 128-row score block fit comfortably in VMEM: this kernel keeps
scores on-chip entirely, one MXU pass for Q@K^T and one for P@V per
(bh, q-block) program. No online-softmax machinery is needed at this
sequence length (cf. flash attention); a full-width VMEM softmax is
simpler and just as fast.

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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int):
    q = q_ref[0]                                   # [bq, D]
    k = k_ref[0]                                   # [Tk_pad, D]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jnp.dot(p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = 256) -> jax.Array:
    """softmax(Q K^T) V with scores kept in VMEM.

    q: [B, H, Tq, D] (pre-scaled), k/v: [B, H, Tk, D]. Returns q-shaped.
    Sequence lengths are padded on-kernel to lane multiples; padded keys
    are masked, padded queries dropped on return.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, 128)

    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    if tq_pad != tq:
        qf = jnp.pad(qf, ((0, 0), (0, tq_pad - tq), (0, 0)))
    if tk_pad != tk:
        kf = jnp.pad(kf, ((0, 0), (0, tk_pad - tk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, tk_pad - tk), (0, 0)))

    grid = (b * h, tq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, kv_len=tk),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qb: (bh, qb, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq_pad * tk_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * tq_pad * tk_pad,
        ),
    )(qf, kf, vf)
    return out[:, :tq].reshape(b, h, tq, d)


def supports_pallas() -> bool:
    """True when running on a real TPU backend (Mosaic lowering)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")
