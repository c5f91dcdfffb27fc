"""[EXPERIMENT — measured dead end, NOT in the serving path]

Decode-loop GEMV attention Pallas kernel (self + cross sublayers).
See experiments/README.md for the full measured story. Summary: the
decode GEMV is VPU-BOUND, not HBM-bound — XLA's fused
convert+multiply+reduce loop already runs the cross read at ~6.5 us per
(row, layer), which IS the VPU floor for exact bf16-product attention at
[H=20, Dh=64, T=1536]. Neither kernel variant here beats it:

  * v1 (per-head VPU loop): ~31 us/row — op-count-bound (~90 small
    strided ops per row; per-op fixed cost dominates).
  * v2 (this file: block-diagonal MXU dots): ~34-43 us/row — the MXU
    pays full 128-row M-tiles for 20-head work (6.4x waste, ~16 us per
    dot at T=1536).
  * In-scan: fused cross 13.67 ms/step vs XLA 13.77 (parity); fused
    self 29.1 vs XLA 9.5 (3x WORSE).

Why this kernel was built (measured, scripts/dec_split_bench.py +
scripts/dump_cross_hlo.py): at decode time the attention reads the whole
quantized KV cache with a 1-token query per row. XLA lowers that GEMV
oddly on TPU — the q.K contraction becomes a VPU loop fusion, the p.V
contraction becomes a *dilated convolution*, and the s4 operands get
full relayout copies (T(64,128) -> T(8,128)). The cross-attention read
measured ~39% of HBM peak vs ~71% for plain weight streams (MLP), which
LOOKED like a 2.5x kernel opportunity — but the 39% turns out to be a
~100%-busy VPU, not a starved HBM: the relayout copies are hoisted out
of the decode loop (loop-invariant), and the loop fusion is
element-throughput-optimal. The only structural lever left for decode is
multi-token verification (decoding/assisted.py), which amortizes BOTH
the cache read and the VPU convert+FMA work over S tokens per pass.

This kernel streams the cache rows in their NATIVE layout (sequence-last
[.., H, Dh, T], s4/s8), converts once in VMEM, and folds all heads into
TWO wide MXU dots per row via block-diagonal/masked-select tricks (a
straight M=1 GEMV would waste the MXU, and a per-head VPU loop is
op-count-bound — measured 12x over the DMA floor). One grid step = one
batch row: K row + V row (~1 MB each in int4 at T=1536) fit in VMEM with
double buffering, so Mosaic overlaps the next row's DMA with this row's
arithmetic. bf16 caches fall back to the XLA path (their VMEM blocks
don't fit; serving caches are always quantized).

The layer index arrives as a PREFETCHED SCALAR and the kernel indexes the
full stacked cache [L, B, H, Dh, T] directly — the caller never slices
the cache per layer, so no per-layer copy of a 60 MB s4 buffer can ever
materialize (and s4 never crosses a jit boundary, which the axon backend
cannot do; see models/quantize.py).

Numerics contract (tested): identical PRODUCTS to the XLA path in
models/whisper.decode_step's seq_last_attention — q/K bf16 values
multiplied in f32, scores scaled by the per-position bf16 scales in f32,
-1e9 masking, f32 softmax, probs*v_scale rounded through bf16 before the
V contraction — only the f32 ACCUMULATION ORDER differs (VPU tree vs MXU
systolic), so outputs agree to f32 reduction tolerance (~1e-6 relative),
not bit-exactly.

Cross-attention parity target: hf modeling_whisper.py:321-346 attention
against cached encoder K/V; alignment-head capture generation_whisper.py
:257-264 (the [H, A] one-hot selection runs INSIDE the kernel so only
[A, T] rows leave VMEM instead of all-head probs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9                  # matches decode_step's mask fill


def _kernel(scalar_ref, *refs, n_heads: int, t: int, has_scales: bool,
            has_position: bool, has_key_mask: bool, n_align: int,
            op_dtype: jnp.dtype):
    """One batch row: scores -> softmax -> (out [H, Dh], aligned [A, T])."""
    i = 0
    q_ref = refs[i]; i += 1                      # [1, H, Dh]
    k_ref = refs[i]; i += 1                      # [1, 1, H, Dh, T]
    v_ref = refs[i]; i += 1
    ks_ref = vs_ref = None
    if has_scales:
        ks_ref = refs[i]; i += 1                 # [1, 1, H, T]
        vs_ref = refs[i]; i += 1
    mask_ref = None
    if has_key_mask:
        mask_ref = refs[i]; i += 1               # [1, T] int8
    sel_ref = None
    if n_align:
        sel_ref = refs[i]; i += 1                # [H, A]
    out_ref = refs[i]; i += 1                    # [1, H, Dh]
    align_ref = refs[i] if n_align else None     # [1, A, T]

    # ---- scores: ONE MXU dot via a block-diagonal q ----
    # s[h, t] = sum_d q[h, d] k[h, d, t]. Build q_bd [H, H*Dh] with q[h]
    # in columns h*Dh:(h+1)*Dh and zeros elsewhere; k viewed [H*Dh, T]
    # (free reshape, sublane-major). The extra MACs multiply exact zeros,
    # so s is EXACTLY the sum of the same 64 bf16-product terms as the
    # XLA path (f32 + 0.0 is exact), just MXU-accumulated.
    hd = n_heads * (q_ref.shape[-1])
    dh = q_ref.shape[-1]
    q = q_ref[0]                                              # [H, Dh]
    k_flat = k_ref[0, 0].reshape(hd, t).astype(op_dtype)      # [HD, T]
    row_h = jax.lax.broadcasted_iota(jnp.int32, (n_heads, hd), 0)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (n_heads, hd), 1) // dh
    # q tiled along LANES (sublane->lane reshapes are not legal in
    # Mosaic; lane concat is): q_tile[h, c] = q[h, c mod Dh]
    q_tile = jnp.concatenate([q] * n_heads, axis=1)           # [H, HD]
    q_bd = jnp.where(row_h == col_h, q_tile, jnp.zeros((), op_dtype))
    s = jax.lax.dot_general(q_bd, k_flat, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [H, T]
    if has_scales:
        s = s * ks_ref[0, 0].astype(jnp.float32)
    if has_position:
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (n_heads, t), 1)
        s = jnp.where(t_ids <= scalar_ref[1], s, _NEG_INF)
    if has_key_mask:
        s = jnp.where(mask_ref[0][None, :] != 0, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)   # [H, T] f32

    pv = p * vs_ref[0, 0].astype(jnp.float32) if has_scales else p
    # replicate the XLA path's q.dtype rounding of the probs operand
    pvb = pv.astype(op_dtype)                                 # [H, T]
    # ---- output: ONE MXU dot + masked head-column select ----
    # r[rd, h] = sum_t v_flat[rd, t] pvb[h, t]; the valid entry for flat
    # row rd is head rd // Dh — select it and drop the rest (exact zeros
    # added, same product terms as the XLA path).
    v_flat = v_ref[0, 0].reshape(hd, t).astype(op_dtype)      # [HD, T]
    r = jax.lax.dot_general(pvb, v_flat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [H, HD]
    # out[h, d] = r[h, h*Dh + d]: zero the other head blocks, then
    # compact the lanes with a 0/1 selection matrix S[c, d] =
    # (c mod Dh == d) — one more tiny MXU dot, exact (x*1 + 0 terms)
    r_masked = jnp.where(row_h == col_h, r, 0.0)               # [H, HD]
    sc = jax.lax.broadcasted_iota(jnp.int32, (hd, dh), 0) % dh
    sd = jax.lax.broadcasted_iota(jnp.int32, (hd, dh), 1)
    compact = jnp.where(sc == sd, 1.0, 0.0)                    # [HD, Dh]
    out_ref[0] = jax.lax.dot_general(
        r_masked, compact, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [H, Dh]

    if n_align:
        sel = sel_ref[...].astype(jnp.float32)   # [H, A]
        align_ref[0] = jax.lax.dot_general(
            sel, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [A, T]


@functools.partial(
    jax.jit,
    static_argnames=("interpret",))
def decode_gemv_attention(q: jax.Array, k_stack: jax.Array,
                          v_stack: jax.Array, layer: jax.Array,
                          k_scale: jax.Array | None = None,
                          v_scale: jax.Array | None = None,
                          position: jax.Array | None = None,
                          key_mask: jax.Array | None = None,
                          sel: jax.Array | None = None,
                          interpret: bool | None = None):
    """Single-query attention of one decoder layer against the stacked
    KV cache.

    Args:
      q: [B, H, Dh] bf16/f32, pre-scaled by Dh**-0.5 (caller contract,
        as in models/whisper.decode_step).
      k_stack/v_stack: [L, B, H, Dh, T] — the FULL stacked cache
        (s4 / s8 / bf16 / f32); `layer` (scalar int32) picks the layer
        inside the kernel via scalar prefetch.
      k_scale/v_scale: optional [L, B, H, T] per-position dequant scales.
      position: optional traced scalar — mask cache positions > position
        (the self-attention causal ring mask).
      key_mask: optional [B, T] (bool/int8) — extra attendable-position
        mask (conditioned-prompt left-pads).
      sel: optional [H, A] one-hot alignment selector; when given, the
        kernel also returns aligned probs [B, A, T] f32.

    Returns out [B, H, Dh] f32, or (out, aligned) when sel is not None.
    """
    l, b, h, dh, t = k_stack.shape
    assert q.shape == (b, h, dh), (q.shape, k_stack.shape)
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    has_scales = k_scale is not None
    has_position = position is not None
    has_key_mask = key_mask is not None
    n_align = 0 if sel is None else sel.shape[-1]

    scalars = jnp.stack([jnp.asarray(layer, jnp.int32),
                         (jnp.asarray(position, jnp.int32)
                          if has_position else jnp.int32(0))])

    def at_layer(bi, sref):
        return (sref[0], bi, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, h, dh), lambda bi, sref: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h, dh, t), at_layer, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h, dh, t), at_layer, memory_space=pltpu.VMEM),
    ]
    inputs = [q, k_stack, v_stack]
    # block rank matches array rank; k_stack is rank-5 and the block
    # (1, 1, h, dh, t) selects (layer, batch-row).
    if has_scales:
        in_specs += [
            pl.BlockSpec((1, 1, h, t), lambda bi, sref: (sref[0], bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, t), lambda bi, sref: (sref[0], bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [k_scale, v_scale]
    if has_key_mask:
        in_specs.append(pl.BlockSpec((1, t), lambda bi, sref: (bi, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(key_mask, jnp.int8))
    if n_align:
        in_specs.append(pl.BlockSpec((h, n_align),
                                     lambda bi, sref: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(sel, jnp.float32))

    out_shapes = [jax.ShapeDtypeStruct((b, h, dh), jnp.float32)]
    out_specs = [pl.BlockSpec((1, h, dh), lambda bi, sref: (bi, 0, 0),
                              memory_space=pltpu.VMEM)]
    if n_align:
        out_shapes.append(jax.ShapeDtypeStruct((b, n_align, t), jnp.float32))
        out_specs.append(pl.BlockSpec((1, n_align, t),
                                      lambda bi, sref: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel, n_heads=h, t=t, has_scales=has_scales,
        has_position=has_position, has_key_mask=has_key_mask,
        n_align=n_align, op_dtype=q.dtype)

    itemsize = 0.5 if k_stack.dtype == jnp.int4 else k_stack.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * dh * t,
            bytes_accessed=int(2 * b * h * dh * t * itemsize),
            transcendentals=b * h * t,
        ),
        interpret=interpret,
    )(scalars, *inputs)
    out, aligned = (outs if n_align else (outs[0], None))
    if n_align:
        return out, aligned
    return out


def _microbench():
    """Chained isolated timing (axon dispatch latency amortized) + a
    CPU-interpret parity spot check. Numbers in experiments/README.md."""
    import os
    import sys
    import time

    import numpy as np

    L, B, H, DH, T = 2, 64, 20, 64, 1536
    REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ITERS = int(os.environ.get("ITERS", "3"))

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, H, DH)), jnp.bfloat16) * 0.3
    k8 = jnp.asarray(rng.integers(-7, 8, (L, B, H, DH, T), dtype=np.int8))
    v8 = jnp.asarray(rng.integers(-7, 8, (L, B, H, DH, T), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(.01, .1, (L, B, H, T)), jnp.bfloat16)
    vs = jnp.asarray(rng.uniform(.01, .1, (L, B, H, T)), jnp.bfloat16)
    sel = np.zeros((H, 15), np.float32)
    for a in range(15):
        sel[a % H, a] = 1.0
    sel = jnp.asarray(sel)

    def chain(cast):
        def run(q0, k8, v8, ks, vs):
            k, v = cast(k8), cast(v8)

            def body(i, qq):
                out, _ = decode_gemv_attention(
                    qq, k, v, i % L, k_scale=ks, v_scale=vs, sel=sel)
                return q0 + out[:, :, :DH].astype(q0.dtype) * 1e-6

            return jax.lax.fori_loop(0, REPS, body, q0)[0, 0, 0]
        return jax.jit(run)

    for name, cast in [("s4", lambda x: x.astype(jnp.int4)),
                       ("s8", lambda x: x),
                       ("bf16", lambda x: x.astype(jnp.bfloat16) * 0.05)]:
        fn = chain(cast)
        try:
            float(fn(q0, k8, v8, ks, vs))
        except Exception as e:                 # bf16 blocks OOM VMEM
            print(f"{name:5s} FAILED: {str(e)[:120]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(ITERS):
            float(fn(q0, k8, v8, ks, vs))
        dt = (time.perf_counter() - t0) / ITERS / REPS
        print(f"{name:5s} {dt * 1e6:8.1f} us/layer-call", flush=True)


if __name__ == "__main__":
    _microbench()
