"""Pallas decode-step cross-attention over an int8-quantized KV cache.

Decode is HBM-bound on cross-K/V reads (large-v3: ~250 MB per item per
step in bf16, read 32x per token). Quantizing the cross cache to int8
halves that traffic AND capacity, but XLA alone materializes the
dequantized bf16 tensors in HBM (measured slower than bf16). This kernel
keeps everything in VMEM: int8 K/V blocks stream in, dequantization
happens in registers via per-position scales folded into the score
(s_j = (q . k_j^int8) * k_scale_j) and the value sum, and only the [1, D]
output plus the [K] probability row (needed for DTW alignment) leave.

Layout: one grid program per (batch*head); K/V per program are
[K_enc, 64] int8 (~100 KB each at 1500 keys) — far under VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, p_ref):
    q = q_ref[0].astype(jnp.float32)                  # [1, D]
    kq = kq_ref[0]                                     # [K, D] int8
    ks = ks_ref[0].astype(jnp.float32)                 # [K, 1]
    s = jax.lax.dot_general(q, kq.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [1, K]
    s = s * ks[:, 0][None, :]
    p = jax.nn.softmax(s, axis=-1)                     # [1, K] f32
    vq = vq_ref[0]                                     # [K, D] int8
    vs = vs_ref[0].astype(jnp.float32)                 # [K, 1]
    pv = p * vs[:, 0][None, :]                         # fold value scales
    out = jnp.dot(pv.astype(jnp.bfloat16), vq.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)  # [1, D]
    o_ref[0] = out.astype(o_ref.dtype)
    p_ref[0] = p.astype(p_ref.dtype)


@jax.jit
def cross_attention_int8(q: jax.Array, k_q: jax.Array, k_s: jax.Array,
                         v_q: jax.Array, v_s: jax.Array
                         ) -> tuple[jax.Array, jax.Array]:
    """q [B,H,1,D] (pre-scaled) x int8 KV [B,H,K,D] + scales [B,H,K,1]
    -> (out [B,H,1,D] q-dtype, probs [B,H,K] f32)."""
    b, h, _, d = q.shape
    k = k_q.shape[2]
    bh = b * h
    qf = q.reshape(bh, 1, d)
    out, probs = pl.pallas_call(
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((bh, 1, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, 1, k), jnp.float32)),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * k * d,
            bytes_accessed=2 * bh * k * d + 2 * bh * k * 2,
            transcendentals=bh * k,
        ),
    )(qf, k_q.reshape(bh, k, d), k_s.reshape(bh, k, 1),
      v_q.reshape(bh, k, d), v_s.reshape(bh, k, 1))
    return out.reshape(b, h, 1, d), probs.reshape(b, h, k)


def dequant_reference(q, k_q, k_s, v_q, v_s):
    """XLA path with the per-position scales folded OUT of the matmuls:
    the int8->bf16 convert fuses into the dot's operand read (no HBM
    materialization of dequantized K/V):
        s_j  = (q . k_j^int8) * k_scale_j
        out  = sum_j (p_j * v_scale_j) * v_j^int8
    q may carry any query length (beam-grouped decode uses Tq = NB).
    Returns (out [B,H,Tq,D], probs [B,H,Tq,K] f32).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q,
                   k_q.astype(q.dtype),
                   preferred_element_type=jnp.float32)
    s = s * k_s.astype(jnp.float32)[..., 0][:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    pv = p * v_s.astype(jnp.float32)[..., 0][:, :, None, :]
    out = jnp.einsum("bhqk,bhkd->bhqd", pv.astype(q.dtype),
                     v_q.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype), p
