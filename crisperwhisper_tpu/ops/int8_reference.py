"""Folded-scale int8/int4 attention — the XLA serving semantics oracle.

This is the exact formulation the decode step uses for its quantized
cross cache (models/whisper.py decode_step's seq_last_attention): scales
folded OUT of the matmuls so the int8->bf16 convert fuses into the dot's
operand read and no dequantized K/V ever materializes in HBM. Kept as a
head-dim-last reference for tests; the Pallas kernel experiments built on
it live in experiments/decode_attention_v*.py with their microbench
numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dequant_reference(q, k_q, k_s, v_q, v_s):
    """XLA path with the per-position scales folded OUT of the matmuls:
        s_j  = (q . k_j^int) * k_scale_j
        out  = sum_j (p_j * v_scale_j) * v_j^int
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
