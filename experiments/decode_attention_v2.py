"""Pallas decode cross-attention v2: all heads per grid program.

v1 (decode_attention.py::cross_attention_int8) used one program per
(batch, head) — 480 tiny programs whose grid-sequencing overhead dwarfed
the 200 KB DMAs. Here one program handles a full batch item's 20 heads:
~7.7 MB of int8 K/V per program, 24 programs per layer, with the head loop
unrolled inside (each head is one [1,64]x[64,1500] MXU pass). Scores,
softmax and the value reduction stay in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, p_ref, *,
            n_heads: int):
    for h in range(n_heads):              # static unroll
        q = q_ref[0, h].astype(jnp.bfloat16)               # [1, D]
        kq = kq_ref[0, h]                                   # [K, D] int8
        s = jax.lax.dot_general(q, kq.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * ks_ref[0, h].astype(jnp.float32)[None, :]   # [1, K]
        p = jax.nn.softmax(s, axis=-1)
        pv = (p * vs_ref[0, h].astype(jnp.float32)[None, :]
              ).astype(jnp.bfloat16)
        out = jnp.dot(pv, vq_ref[0, h].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)   # [1, D]
        o_ref[0, h] = out.astype(o_ref.dtype)
        p_ref[0, h] = p.astype(p_ref.dtype)


@jax.jit
def cross_attention_int8_v2(q: jax.Array, k_q: jax.Array, k_s: jax.Array,
                            v_q: jax.Array, v_s: jax.Array
                            ) -> tuple[jax.Array, jax.Array]:
    """q [B,H,1,D] (pre-scaled) x int8 KV [B,H,K,D] + scales [B,H,K,1]
    -> (out [B,H,1,D] q-dtype, probs [B,H,K] f32)."""
    b, h, _, d = q.shape
    k = k_q.shape[2]
    out, probs = pl.pallas_call(
        functools.partial(_kernel, n_heads=h),
        out_shape=(jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, 1, k), jnp.float32)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, k, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, k, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 1, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * k * d,
            bytes_accessed=2 * b * h * k * d + 4 * b * h * k,
            transcendentals=b * h * k,
        ),
    )(q, k_q, k_s[..., 0], v_q, v_s[..., 0])
    return out, probs[:, :, 0, :]
