"""[EXPERIMENT — round 5] int8 x int8 MXU dots for the decode cache reads.

VERDICT: **REFUTED on chip** — see experiments/README.md (round 5
section) for the in-context table. Attention int8-MXU is a wash vs the
serving dequant-into-dot form; W8A8 dense loses 1.56x in-context. The
scan-xs microbench below is additionally slice-copy-bound and cannot
rank the variants; the authoritative numbers came from wiring the
formulations into models/whisper.decode_step (temporarily, behind
CW_INT8_MXU — removed after measurement) and running
scripts/dec_split_bench.py on the real chip.

VERDICT r4 item 1: the batched decode step measures 25.57 ms vs a
9.98 ms HBM byte floor (decode_floor_frac 0.39) and the round-2
diagnosis (experiments/README.md decode_gemv_v3) is that the quantized
cache GEMV is VPU-bound — XLA fuses int->bf16 convert + multiply +
reduce into one VPU loop at element throughput, and every prior kernel
attempt KEPT that convert on the VPU. The one untried lever: feed the
MXU int8 operands directly (`lax.dot_general(int8, int8) ->
int32` native accumulation), folding the dequant scales on the int32
partials AFTER the dot, so the [B, H, Dh, T] cache never takes a
per-element convert pass at all.

The trade: the query / probability operands must themselves be
quantized to int8 (symmetric absmax per (b, h) row) — VPU work on
[B, H, T]-sized tensors (64x smaller than the [B, H, Dh, T] convert
this removes) — and the products are no longer bit-matched to the
exact-bf16-product serving contract. This is therefore an OPT-IN
serving-numerics mode (like the b1 whole-step kernel), gated on a
measured token-agreement + tolerance contract.

Contract target (exactness reference): the per-step attention of
hf modeling_whisper.py:435-546 against cached K/V; the exact-product
baseline here is models/whisper.decode_step's seq_last_attention.

Usage (real chip): python experiments/decode_int8_mxu.py [B] [T]
Env: ITERS (default 3), REPS (chained steps, default 64).
Measured results: experiments/README.md (round 5 section).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _absmax_quantize(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric absmax int8 quantization along `axis` (f32 in/out scale)."""
    m = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(m, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def attention_exact(q, k_i, v_i, k_scale, v_scale, mask=None):
    """The serving path's exact-product form (decode_step
    seq_last_attention): dequant-convert on the VPU, bf16 dots."""
    s = jnp.einsum("bhqd,bhdt->bhqt", q, k_i.astype(q.dtype),
                   preferred_element_type=jnp.float32)
    s = s * k_scale.astype(jnp.float32)[:, :, None, :]
    if mask is not None:
        s = jnp.where(mask, s, jnp.float32(_NEG_INF))
    p = jax.nn.softmax(s, axis=-1)
    pv = p * v_scale.astype(jnp.float32)[:, :, None, :]
    out = jnp.einsum("bhqt,bhdt->bhqd", pv.astype(q.dtype),
                     v_i.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention_int8_mxu(q, k_i, v_i, k_scale, v_scale, mask=None):
    """int8 x int8 MXU formulation: quantize q and (p * v_scale) per
    (b, h) row, contract in int8 with int32 accumulation, fold ALL
    scales on the int32 partials. The [B, H, Dh, T] cache operands go
    to the dot untouched (int4 is widened to int8 — a narrowing-free
    repack — when the cache is int4)."""
    if k_i.dtype != jnp.int8:
        k_i = k_i.astype(jnp.int8)
        v_i = v_i.astype(jnp.int8)
    qq, qs = _absmax_quantize(q.astype(jnp.float32), axis=-1)  # [B,H,1,Dh]
    s_i = jax.lax.dot_general(
        qq, k_i, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)                      # [B,H,1,T]
    s = (s_i.astype(jnp.float32) * qs
         * k_scale.astype(jnp.float32)[:, :, None, :])
    if mask is not None:
        s = jnp.where(mask, s, jnp.float32(_NEG_INF))
    p = jax.nn.softmax(s, axis=-1)
    pv = p * v_scale.astype(jnp.float32)[:, :, None, :]        # [B,H,1,T]
    pq, ps = _absmax_quantize(pv, axis=-1)
    o_i = jax.lax.dot_general(
        pq, v_i, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)                      # [B,H,1,Dh]
    return (o_i.astype(jnp.float32) * ps).astype(q.dtype)


def dense_dequant(x, w_q, w_scale):
    """Serving weight path: int8 weight dequantized into the dot's
    operand read (models/whisper.dense)."""
    y = jnp.einsum("bi,io->bo", x, w_q.astype(x.dtype),
                   preferred_element_type=x.dtype)
    return y * w_scale.astype(y.dtype)


def dense_w8a8(x, w_q, w_scale):
    """W8A8 dynamic: quantize activations per row, int8 MXU dot, fold
    (row scale x channel scale) on the int32 result."""
    xq, xs = _absmax_quantize(x.astype(jnp.float32), axis=-1)  # [B,1]
    y_i = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (y_i.astype(jnp.float32) * xs
            * w_scale.astype(jnp.float32)).astype(x.dtype)


def _bench():
    import os
    import sys
    import time

    import numpy as np

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    H, DH, L = 20, 64, 4          # stacked layers scanned per outer rep
    REPS = int(os.environ.get("REPS", "64"))
    ITERS = int(os.environ.get("ITERS", "3"))

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, H, 1, DH)), jnp.bfloat16) * 0.3
    k8 = jnp.asarray(rng.integers(-7, 8, (L, B, H, DH, T), dtype=np.int8))
    v8 = jnp.asarray(rng.integers(-7, 8, (L, B, H, DH, T), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(.01, .1, (L, B, H, T)), jnp.bfloat16)
    vs = jnp.asarray(rng.uniform(.01, .1, (L, B, H, T)), jnp.bfloat16)

    # ---- numerics: int8-MXU vs exact on one call --------------------
    ref = attention_exact(q0, k8[0], v8[0], ks[0], vs[0])
    got = attention_int8_mxu(q0, k8[0], v8[0], ks[0], vs[0])
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"numerics: max abs err {err:.3e}  max-normalized {rel:.3e}",
          flush=True)

    # The chained loop consumes the stacked cache as SCAN XS — the same
    # access pattern as the serving decode body (models/whisper.py
    # decode_step's layer scan), where XLA fuses the per-layer slice
    # into the consumer instead of materializing a [B, H, Dh, T] copy.
    # (A fori_loop + dynamic_index harness was measured first and both
    # variants ran at the slice-copy bandwidth — masking the compute
    # difference entirely.)
    def chain(fn, cast):
        def run(q0, k8, v8, ks, vs):
            k, v = cast(k8), cast(v8)

            def body(qq, xs):
                k_l, v_l, ks_l, vs_l = xs
                out = fn(qq, k_l, v_l, ks_l, vs_l)
                return q0 + out.astype(q0.dtype) * 1e-6, ()

            def outer(i, qq):
                qq, _ = jax.lax.scan(body, qq, (k, v, ks, vs))
                return qq

            return jax.lax.fori_loop(0, REPS // L, outer, q0)[0, 0, 0, 0]
        return jax.jit(run)

    ident = lambda x: x
    to4 = lambda x: jnp.clip(x, -7, 7).astype(jnp.int4)
    cases = [
        ("exact s8   (serving)", attention_exact, ident),
        ("exact s4   (serving)", attention_exact, to4),
        ("int8mxu s8        ", attention_int8_mxu, ident),
        ("int8mxu s4->s8    ", attention_int8_mxu, to4),
    ]
    for name, fn, cast in cases:
        run = chain(fn, cast)
        try:
            float(run(q0, k8, v8, ks, vs))
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:140]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(ITERS):
            float(run(q0, k8, v8, ks, vs))
        dt = (time.perf_counter() - t0) / ITERS / REPS
        print(f"{name} {dt * 1e3:8.3f} ms/call  "
              f"({dt / B * 1e6:6.2f} us/row)", flush=True)

    # ---- weight GEMV: dequant-into-dot vs W8A8 ----------------------
    # WL x 6.5 MB = 210 MB of stacked weights — larger than VMEM, so the
    # scan streams every layer's weights from HBM each pass (like the
    # real 32-layer decode body). A 2-layer stack fits VMEM and measured
    # compute-only numbers (13 GB/s apparent "bandwidth").
    DIN, DOUT, WL = 1280, 5120, 32
    x0 = jnp.asarray(rng.standard_normal((B, DIN)), jnp.bfloat16) * 0.3
    wq = jnp.asarray(rng.integers(-127, 128, (WL, DIN, DOUT), dtype=np.int8))
    wsc = jnp.asarray(rng.uniform(.001, .01, (WL, DOUT)), jnp.bfloat16)

    refw = dense_dequant(x0, wq[0], wsc[0])
    gotw = dense_w8a8(x0, wq[0], wsc[0])
    errw = float(jnp.max(jnp.abs(refw.astype(jnp.float32)
                                 - gotw.astype(jnp.float32))))
    relw = errw / float(jnp.max(jnp.abs(refw.astype(jnp.float32))))
    print(f"\nweight GEMV numerics: max abs {errw:.3e} "
          f"max-normalized {relw:.3e}", flush=True)

    def wchain(fn):
        def run(x0, wq, wsc):
            def body(xx, xs):
                wq_l, wsc_l = xs
                y = fn(xx, wq_l, wsc_l)
                return x0 + y[:, :DIN] * 1e-6, ()

            def outer(i, xx):
                xx, _ = jax.lax.scan(body, xx, (wq, wsc))
                return xx

            return jax.lax.fori_loop(0, REPS // WL, outer, x0)[0, 0]
        return jax.jit(run)

    for name, fn in [("dense dequant (serving)", dense_dequant),
                     ("dense w8a8             ", dense_w8a8)]:
        run = wchain(fn)
        float(run(x0, wq, wsc))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            float(run(x0, wq, wsc))
        dt = (time.perf_counter() - t0) / ITERS / REPS
        bw = (DIN * DOUT) / dt / 1e9
        print(f"{name} {dt * 1e3:8.3f} ms/call  ({bw:6.1f} GB/s weight "
              f"stream)", flush=True)


if __name__ == "__main__":
    _bench()
