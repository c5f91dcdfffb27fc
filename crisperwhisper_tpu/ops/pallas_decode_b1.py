"""Whole-step Pallas decoder kernel for BATCH-1 decode (single stream).

Why a megakernel at B=1 and not at B=64: the round-2/3 measurements
(experiments/README.md decode_gemv_v3 / selfattn_ring_designs) pinned the
BATCHED decode step as VPU-element-bound on the cache GEMVs — a Pallas
kernel cannot beat XLA's fused convert+multiply+reduce there. At B=1 the
regime flips: the caches shrink 64x while the WEIGHT stream (~0.8 GB/step
at int8 large-v3) is batch-invariant, so the step is weight-bandwidth
bound with a measured 2.3x gap to the streaming floor (2.32 ms vs
~1.0 ms, NOTES_ROUND3.md item 4) — the gap is inter-op scheduling
bubbles, which one fused kernel with double-buffered weight streaming
removes.

Structure: ONE `pallas_call` over grid (L layers x S phases). Every dense
weight is consumed in K-tiles; each operand's BlockSpec index map is
CLAMPED to its phase window, so Pallas's automatic double-buffered
pipeline prefetches each tile exactly once per layer, one grid step
ahead of its use — HBM never idles between sublayers (the XLA scan pays
an op-boundary bubble per dense op; ~300 of them per step at B=1).

Sub-phases per layer (static schedule):
  ln1+qkv tiles -> self scores (ring K) -> self out (ring V) ->
  o tiles -> ln2+cross-q tiles -> cross scores (cross K) ->
  cross out + alignment (cross V) -> c_o tiles -> ln3+mlp1 tiles ->
  mlp2 tiles (+ residual)

The kernel reproduces models/whisper.decode_step semantics for the
gated configuration (see `supported()`): int8 fused-qkv decoder weights,
int8 self ring with per-position scales, int8/int4 cross cache with
per-position scales, scalar position, no key_mask, no beam grouping.
The fresh self K/V column is quantized IN-kernel and merged into the
softmax directly (design D of experiments/selfattn_ring_designs — the
read-only lower bound), and the ring update happens OUTSIDE as one
batched [L, 1, H, Dh, 1] column write per tensor: with the whole layer
stack inside one kernel there is no per-layer scatter left to pay.
Alignment-head contributions are rounded to align_dtype (bf16 in
serving) before accumulation to match the XLA path's
stacked-in-align_dtype-then-sum numerics (the selector is one-hot, so
the cross-layer sum is exact in any dtype).

Exactness: NOT bit-identical to the XLA step (f32 residual stream vs
bf16, tiled f32 dot accumulation) — it is a serving numerics option like
the int8/int4 caches, gated by GenerationOptions and covered by
token-agreement + tolerance parity tests (tests/test_b1_kernel.py).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9          # matches decode_step's mask constant


def _gelu_erf(x):
    """Exact-erf GELU via Abramowitz & Stegun 7.1.26 (|erf err| <=
    1.5e-7, ~1 f32 ulp). Mosaic has no erf/erfc lowering (verified
    round 4: `jax.nn.gelu(approximate=False)` -> erfc ->
    NotImplementedError), so the kernel computes erf from exp — well
    inside this kernel's tolerance-band numerics contract (module
    docstring: f32-vs-bf16 residual stream is a larger deviation)."""
    z = x * 0.7071067811865476          # x / sqrt(2)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    erf_az = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.where(z < 0.0, -erf_az, erf_az)
    return 0.5 * x * (1.0 + erf_z)


def _auto_interpret() -> bool:
    """Mosaic on a real TPU backend, interpret elsewhere. The axon
    backend reports platform "axon" (canonicalized to "tpu" only for
    MLIR lowering), so `jax.default_backend() != "tpu"` would silently
    interpret-run on the real chip — gate on the device platform like
    ops/fused_attention.supports_pallas."""
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:                                 # pragma: no cover
        return True


def _pick_tiles(k: int, n: int, elem_bytes: float, target: int) -> int:
    """Number of K-tiles for a [k, n] weight so each tile is <= target
    bytes. Tile rows must stay a multiple of 128 when k divides into
    128-row tiles: the GEMV input window is a DYNAMIC lane slice of the
    activation vector, and non-128-aligned lane offsets force Mosaic
    relayouts (or fail to lower)."""
    step = 128 if k % 128 == 0 else 1
    for nt in range(1, k + 1):
        if k % nt:
            continue
        rows = k // nt
        if rows % step:
            continue
        if rows * n * elem_bytes <= target or rows <= max(step, 8):
            return nt
    return k


class B1Schedule(NamedTuple):
    """Static per-layer phase schedule."""
    n_qkv: int
    n_o: int
    n_cq: int
    n_co: int
    n_m1: int
    n_m2: int
    # phase start offsets
    s_qkv: int
    s_selfk: int
    s_selfv: int
    s_o: int
    s_cq: int
    s_crossk: int
    s_crossv: int
    s_co: int
    s_m1: int
    s_m2: int
    total: int


def make_schedule(d: int, f: int, tile_bytes: int = 768 * 1024,
                  self_phases: int = 1,
                  cross_phases: int = 1) -> B1Schedule:
    """self_phases=1: one score + one out phase over a SHARED ring (the
    single-token / M-token-block variants). self_phases=R: one score and
    one out phase PER ROW, each fetching only that row's ring — the
    beam-rows variant, which keeps per-row ring blocks (not R rings at
    once) inside VMEM. cross_phases=R additionally splits the cross
    score/out into one phase per row fetching that row's cross block —
    the multi-STREAM small-batch variant (rows own distinct items, so
    the cross cache is per-row too; beams share it)."""
    n_qkv = _pick_tiles(d, 3 * d, 1, tile_bytes)
    n_o = _pick_tiles(d, d, 1, tile_bytes)
    n_cq = n_o
    n_co = n_o
    n_m1 = _pick_tiles(d, f, 1, tile_bytes)
    n_m2 = _pick_tiles(f, d, 1, tile_bytes)
    s_qkv = 0
    s_selfk = s_qkv + n_qkv
    s_selfv = s_selfk + self_phases
    s_o = s_selfv + self_phases
    s_cq = s_o + n_o
    s_crossk = s_cq + n_cq
    s_crossv = s_crossk + cross_phases
    s_co = s_crossv + cross_phases
    s_m1 = s_co + n_co
    s_m2 = s_m1 + n_m1
    total = s_m2 + n_m2
    return B1Schedule(n_qkv, n_o, n_cq, n_co, n_m1, n_m2,
                      s_qkv, s_selfk, s_selfv, s_o, s_cq, s_crossk,
                      s_crossv, s_co, s_m1, s_m2, total)


def _kernel(pos_ref,                                     # scalar prefetch
            x0_ref, lns_ref,
            qkv_w_ref, qkv_s_ref, qkv_b_ref,
            o_w_ref, o_s_ref, o_b_ref,
            cq_w_ref, cq_s_ref, cq_b_ref,
            co_w_ref, co_s_ref, co_b_ref,
            m1_w_ref, m1_s_ref, m1_b_ref,
            m2_w_ref, m2_s_ref, m2_b_ref,
            ring_k_ref, ring_v_ref, ring_ks_ref, ring_vs_ref,
            cross_k_ref, cross_v_ref, cross_ks_ref, cross_vs_ref,
            sel_ref,
            # outputs
            hid_ref, align_ref, kcol_ref, vcol_ref, ksc_ref, vsc_ref,
            # scratch
            xr, y, acc, qf, pr,
            *, sched: B1Schedule, m: int, d: int, f: int, h: int, dh: int,
            t_ring: int, k_enc: int, n_align: int, self_qmax: float,
            cross_is_int4: bool, align_bf16: bool, chunk: int = 512,
            beams: bool = False, rows_cross: bool = False):
    """One (layer, phase) grid step over an M-token block (M=1: plain
    decode; M=spec window: the assisted-decoding verify pass — block
    rows are causal among themselves, matching decode_step_multi).
    beams=True: the M rows are BEAM HYPOTHESES at one shared position
    instead of consecutive tokens — each row attends only to ITS OWN
    ring (blocked per row by the R-phase self schedule) plus its own
    fresh column, with no inter-row coupling; this matches
    decode_step(beam_groups=m) at batch 1.
    rows_cross=True (implies beams-style self handling): the M rows are
    DISTINCT STREAMS at one shared position — the cross cache is
    per-row too, fetched one row per phase by the R-phase cross
    schedule. This is plain decode_step at batch M on the fused kernel
    (the small-batch serving regime: compacted seek-loop tails, short
    interactive files, low-concurrency live streams).
    Scratch:
    xr [M, d] f32 residual stream; y [M, max(3d,f)] f32 GEMV input;
    acc [M, max(3d,f)] f32 tile accumulator; qf [M, d] f32 current
    query rows (flat; heads split on SUBLANES per use — Mosaic's
    infer-vector-layout rejects lane splits below 128, e.g.
    (1,1280)->(20,64) "unsupported shape cast", found on-chip round 4);
    pr [M*h, Tmax] f32 attention scores/probs."""
    li = pl.program_id(0)
    s = pl.program_id(1)
    # pr band stride: rows of one token/beam start at multiples of
    # h_band (next multiple of 8 >= h) so DYNAMIC band offsets
    # (pl.ds(r * h_band, h)) are statically provable sublane-aligned —
    # Mosaic rejects "index in dimension 0 not a multiple of 8"
    # (found on-chip round 4, beams variant)
    h_band = -(-h // 8) * 8
    c = sched
    qmax = self_qmax

    def _ln(vec, idx):
        """LayerNorm row `idx` of this layer's stacked [1, 6, d] table
        (rows: ln1.s, ln1.b, ln2.s, ln2.b, ln3.s, ln3.b)."""
        mean = jnp.mean(vec, axis=-1, keepdims=True)
        zc = vec - mean
        var = jnp.mean(zc * zc, axis=-1, keepdims=True)
        g = lns_ref[0, 2 * idx, :]
        b = lns_ref[0, 2 * idx + 1, :]
        return zc * jax.lax.rsqrt(var + 1e-5) * g[None, :] + b[None, :]

    # ---- first grid step of a layer: (re)build y = ln1(x) ----
    @pl.when(s == c.s_qkv)
    def _start_layer():
        @pl.when(li == 0)
        def _init():
            xr[...] = x0_ref[...].astype(jnp.float32)
            align_ref[...] = jnp.zeros_like(align_ref)
        y[:, :d] = _ln(xr[:, :d], 0)
        acc[...] = jnp.zeros_like(acc)

    # ---- generic K-tiled GEMV accumulate: acc[:, :n] += y_rows @ W ----
    # `y` is [1, 4d]: LN outputs occupy y[:, :d]; gelu(mlp1) fills the
    # full width for the mlp2 tiles. The tile index is traced, so the
    # input-row window is a pl.ds dynamic slice.
    def _gemv_tile(w_ref, tile, n_out):
        rows = w_ref.shape[1]
        w = w_ref[0].astype(jnp.float32)               # [rows, n_out]
        xv = y[:, pl.ds(tile * rows, rows)]            # [1, rows]
        acc[:, :n_out] += jax.lax.dot_general(
            xv, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    in_qkv = (s >= c.s_qkv) & (s < c.s_qkv + c.n_qkv)
    in_o = (s >= c.s_o) & (s < c.s_o + c.n_o)
    in_cq = (s >= c.s_cq) & (s < c.s_cq + c.n_cq)
    in_co = (s >= c.s_co) & (s < c.s_co + c.n_co)
    in_m1 = (s >= c.s_m1) & (s < c.s_m1 + c.n_m1)
    in_m2 = (s >= c.s_m2) & (s < c.s_m2 + c.n_m2)

    @pl.when(in_qkv)
    def _qkv():
        _gemv_tile(qkv_w_ref, s - c.s_qkv, 3 * d)

    @pl.when(in_o)
    def _o():
        _gemv_tile(o_w_ref, s - c.s_o, d)

    @pl.when(in_cq)
    def _cq():
        _gemv_tile(cq_w_ref, s - c.s_cq, d)

    @pl.when(in_co)
    def _co():
        _gemv_tile(co_w_ref, s - c.s_co, d)

    @pl.when(in_m1)
    def _m1():
        _gemv_tile(m1_w_ref, s - c.s_m1, f)

    @pl.when(in_m2)
    def _m2():
        _gemv_tile(m2_w_ref, s - c.s_m2, d)

    # ---- phase finishers (run at the LAST tile of each GEMV phase) ----

    @pl.when(s == c.s_qkv + c.n_qkv - 1)
    def _finish_qkv():
        qkv = (acc[:, :3 * d] * qkv_s_ref[0, 0, :][None, :]
               + qkv_b_ref[0, 0, :][None, :])          # [M, 3d]
        # q rows stay FLAT (pre-scaled inside the fused weights); heads
        # are split per use on sublanes — see the scratch docstring.
        qf[...] = qkv[:, :d]
        for mi in range(m):
            # fresh K/V columns in sublane-major COLUMN form
            # [h, dh, 1] (transpose + sublane split — never a lane
            # split), quantized over Dh exactly like decode_step;
            # scales bf16-rounded to match the XLA path, which reads
            # the just-written bf16 cache scale back
            kc = qkv[mi:mi + 1, d:2 * d].T.reshape(h, dh, 1)
            vc = qkv[mi:mi + 1, 2 * d:].T.reshape(h, dh, 1)
            for (colv, cref, sref) in ((kc, kcol_ref, ksc_ref),
                                       (vc, vcol_ref, vsc_ref)):
                amax = jnp.max(jnp.abs(colv), axis=1, keepdims=True)
                sc = jnp.maximum(amax, 1e-8) / qmax            # [h, 1, 1]
                q = jnp.clip(jnp.round(colv / sc), -qmax, qmax)
                cref[0, mi] = q.astype(cref.dtype).reshape(d, 1)
                sref[0, mi] = (sc[:, :, 0].astype(jnp.bfloat16)
                               .astype(sref.dtype))

    # ---- attention primitives: elementwise mult+reduce (trivial VPU
    # work at B=1; avoids the per-head MXU M-tile waste measured in
    # experiments/decode_gemv_v3). The [h, dh, T] broadcast temp is
    # bounded by processing the T axis in STATIC chunks (512 keeps the
    # f32 temp ~2.6 MB; the M-token variant uses 256 — see the VMEM
    # budget note in decode_step_b1_multi). T and k_enc are static, so
    # this is a python loop with static slices — no dynamic control flow.
    _CHUNK = chunk

    def _q3(row):
        """[1, d] query row -> [h, dh, 1] column form: transpose (lane
        -> sublane relayout) then a SUBLANE split — Mosaic supports
        both; the direct (1, d) -> (h, dh) lane split does not pass
        infer-vector-layout."""
        return row.T.reshape(h, dh, 1)

    def _qk_scores(q3, k_ref, width, lead=(0,)):
        """s[h, t] = sum_d q3[h, d, 0] * k_ref[lead][h, d, t],
        t-chunked. `lead` selects the ref's leading block dims ((0,) for
        the shared layer-blocked refs, (0, 0) for the beam per-row ring
        blocks)."""
        parts = []
        for off in range(0, width, _CHUNK):
            w = min(_CHUNK, width - off)
            kq = k_ref[(*lead, slice(None), slice(None),
                        slice(off, off + w))]
            if kq.dtype == jnp.int4:
                kq = kq.astype(jnp.int8)
            parts.append(jnp.sum(q3 * kq.astype(jnp.float32),
                                 axis=1))               # [h, w]
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 \
            else parts[0]

    def _pv_out(p, v_ref, width, lead=(0,)):
        """o[h, dh, 1] = sum_t p[h, t] * v_ref[lead][h, d, t],
        t-chunked; column form so the result folds to [d, 1] and
        transposes into the GEMV input row (no lane merge)."""
        out = jnp.zeros((h, dh, 1), jnp.float32)
        for off in range(0, width, _CHUNK):
            w = min(_CHUNK, width - off)
            vq = v_ref[(*lead, slice(None), slice(None),
                        slice(off, off + w))]
            if vq.dtype == jnp.int4:
                vq = vq.astype(jnp.int8)
            # NB: p[:, None, off:off+w] (newaxis mixed with a PARTIAL
            # slice) lowers via lax.gather, which Mosaic rejects — the
            # round-3 "Shape mismatch in input, indices and output"
            # failure. Slice first, then expand.
            pw = jnp.expand_dims(p[:, off:off + w], 1)    # [h, 1, w]
            out += jnp.sum(pw * vq.astype(jnp.float32), axis=2,
                           keepdims=True)
        return out

    if not beams:
        @pl.when(s == c.s_selfk)
        def _self_scores():
            # scores vs ring K (int8, seq-last [h, dh, t]) + the M fresh
            # columns at slots pos..pos+M-1 (causal among themselves). The
            # ring content at those slots is stale; fresh scores replace
            # it.
            pos = pos_ref[0]
            for mi in range(m):
                q_m = _q3(qf[mi:mi + 1, :])                 # [h, dh, 1]
                sc = _qk_scores(q_m, ring_k_ref, t_ring)    # [h, t]
                sc = sc * ring_ks_ref[0].astype(jnp.float32)
                t_ids = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
                for j in range(m):
                    kc3 = kcol_ref[0, j].reshape(h, dh, 1)
                    fresh = (jnp.sum(q_m * kc3.astype(jnp.float32),
                                     axis=1)
                             * ksc_ref[0, j])               # [h, 1]
                    sc = jnp.where(t_ids == pos + j, fresh, sc)
                sc = jnp.where(t_ids <= pos + mi, sc, _NEG_INF)
                mx = jnp.max(sc, axis=1, keepdims=True)
                e = jnp.exp(sc - mx)
                pr[mi * h_band:mi * h_band + h, :t_ring] = (
                    e / jnp.sum(e, axis=1, keepdims=True))

        @pl.when(s == c.s_selfv)
        def _self_out():
            pos = pos_ref[0]
            for mi in range(m):
                p = pr[mi * h_band:mi * h_band + h, :t_ring]
                t_ids = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
                # per-slot V scales: ring scales, with the fresh scales
                # replacing the (stale) ring entries at pos..pos+M-1
                sv = jnp.broadcast_to(ring_vs_ref[0].astype(jnp.float32),
                                      p.shape)
                for j in range(m):
                    sv = jnp.where(t_ids == pos + j, vsc_ref[0, j], sv)
                pv = p * sv
                pv_ring = jnp.where((t_ids >= pos) & (t_ids < pos + m),
                                    0.0, pv)
                out = _pv_out(pv_ring, ring_v_ref, t_ring)  # [h, dh, 1]
                for j in range(m):
                    pj = jnp.sum(jnp.where(t_ids == pos + j, pv, 0.0),
                                 axis=1, keepdims=True)     # [h, 1]
                    vc3 = vcol_ref[0, j].reshape(h, dh, 1)
                    out += pj[:, :, None] * vc3.astype(jnp.float32)
                y[mi:mi + 1, :d] = out.reshape(d, 1).T      # o-proj input
    else:
        # ---- beam-rows self attention: R score phases + R out phases,
        # phase r fetching ONLY row r's ring block (BlockSpec row map).
        # Each row attends to its own ring at slots <= pos, with its own
        # fresh column replacing the stale ring entry at slot pos.
        in_selfk = (s >= c.s_selfk) & (s < c.s_selfv)
        in_selfv = (s >= c.s_selfv) & (s < c.s_o)

        @pl.when(in_selfk)
        def _self_scores_beam():
            pos = pos_ref[0]
            r = s - c.s_selfk
            q_r = _q3(qf[pl.ds(r, 1), :])                   # [h, dh, 1]
            sc = _qk_scores(q_r, ring_k_ref, t_ring, lead=(0, 0))
            sc = sc * ring_ks_ref[0, 0].astype(jnp.float32)
            t_ids = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
            kfresh = (kcol_ref[0, pl.ds(r, 1)][0]
                      .reshape(h, dh, 1).astype(jnp.float32))
            fresh = (jnp.sum(q_r * kfresh, axis=1)
                     * ksc_ref[0, pl.ds(r, 1)][0])          # [h, 1]
            sc = jnp.where(t_ids == pos, fresh, sc)
            sc = jnp.where(t_ids <= pos, sc, _NEG_INF)
            mx = jnp.max(sc, axis=1, keepdims=True)
            e = jnp.exp(sc - mx)
            pr[pl.ds(r * h_band, h), :t_ring] = (
                e / jnp.sum(e, axis=1, keepdims=True))

        @pl.when(in_selfv)
        def _self_out_beam():
            pos = pos_ref[0]
            r = s - c.s_selfv
            p = pr[pl.ds(r * h_band, h), :t_ring]
            t_ids = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            sv = jnp.broadcast_to(ring_vs_ref[0, 0].astype(jnp.float32),
                                  p.shape)
            sv = jnp.where(t_ids == pos,
                           vsc_ref[0, pl.ds(r, 1)][0], sv)
            pv = p * sv
            pv_ring = jnp.where(t_ids == pos, 0.0, pv)
            out = _pv_out(pv_ring, ring_v_ref, t_ring, lead=(0, 0))
            pj = jnp.sum(jnp.where(t_ids == pos, pv, 0.0), axis=1,
                         keepdims=True)                     # [h, 1]
            vfresh = (vcol_ref[0, pl.ds(r, 1)][0]
                      .reshape(h, dh, 1).astype(jnp.float32))
            out += pj[:, :, None] * vfresh
            y[pl.ds(r, 1), :d] = out.reshape(d, 1).T        # o-proj input

    @pl.when(s == c.s_o - 1)
    def _prep_o_acc():
        # last self-out phase (the only one when not beams): clear the
        # accumulator for the o-projection tiles that start next step
        acc[...] = jnp.zeros_like(acc)

    @pl.when(s == c.s_o + c.n_o - 1)
    def _finish_o():
        xr[...] += (acc[:, :d] * o_s_ref[0, 0, :][None, :]
                    + o_b_ref[0, 0, :][None, :])
        y[:, :d] = _ln(xr[:, :d], 1)
        acc[...] = jnp.zeros_like(acc)

    @pl.when(s == c.s_cq + c.n_cq - 1)
    def _finish_cq():
        qf[...] = (acc[:, :d] * cq_s_ref[0, 0, :][None, :]
                   + cq_b_ref[0, 0, :][None, :])        # [M, d]

    if not rows_cross:
        @pl.when(s == c.s_crossk)
        def _cross_scores():
            for mi in range(m):
                q_m = _q3(qf[mi:mi + 1, :])
                sc = _qk_scores(q_m, cross_k_ref, k_enc)    # [h, K]
                sc = sc * cross_ks_ref[0].astype(jnp.float32)
                mx = jnp.max(sc, axis=1, keepdims=True)
                e = jnp.exp(sc - mx)
                pr[mi * h_band:mi * h_band + h, :k_enc] = (
                    e / jnp.sum(e, axis=1, keepdims=True))

        @pl.when(s == c.s_crossv)
        def _cross_out():
            for mi in range(m):
                p = pr[mi * h_band:mi * h_band + h, :k_enc]
                # alignment capture: one-hot selector row for this layer;
                # round to bf16 first (parity with the XLA stacked-bf16
                # accumulation)
                contrib = jax.lax.dot_general(
                    sel_ref[0], p, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [A, K]
                if align_bf16:
                    contrib = (contrib.astype(jnp.bfloat16)
                               .astype(jnp.float32))
                align_ref[:, mi, :] += contrib
                pv = p * cross_vs_ref[0].astype(jnp.float32)
                out = _pv_out(pv, cross_v_ref, k_enc)       # [h, dh, 1]
                y[mi:mi + 1, :d] = out.reshape(d, 1).T
            acc[...] = jnp.zeros_like(acc)
    else:
        # ---- multi-stream cross attention: R score phases + R out
        # phases, phase r fetching ONLY row r's cross block (one row's
        # K or V in VMEM at a time; BlockSpec row map as for the rings).
        in_crossk = (s >= c.s_crossk) & (s < c.s_crossv)
        in_crossv = (s >= c.s_crossv) & (s < c.s_co)

        @pl.when(in_crossk)
        def _cross_scores_row():
            r = s - c.s_crossk
            q_r = _q3(qf[pl.ds(r, 1), :])                   # [h, dh, 1]
            sc = _qk_scores(q_r, cross_k_ref, k_enc, lead=(0, 0))
            sc = sc * cross_ks_ref[0, 0].astype(jnp.float32)
            mx = jnp.max(sc, axis=1, keepdims=True)
            e = jnp.exp(sc - mx)
            pr[pl.ds(r * h_band, h), :k_enc] = (
                e / jnp.sum(e, axis=1, keepdims=True))

        @pl.when(in_crossv)
        def _cross_out_row():
            r = s - c.s_crossv
            p = pr[pl.ds(r * h_band, h), :k_enc]
            contrib = jax.lax.dot_general(
                sel_ref[0], p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [A, K]
            if align_bf16:
                contrib = (contrib.astype(jnp.bfloat16)
                           .astype(jnp.float32))
            # dynamic sublane slice of the [A, M, K] accumulator — the
            # same dynamic-offset class as the pr row writes above
            align_ref[:, pl.ds(r, 1), :] += contrib[:, None, :]
            pv = p * cross_vs_ref[0, 0].astype(jnp.float32)
            out = _pv_out(pv, cross_v_ref, k_enc, lead=(0, 0))
            y[pl.ds(r, 1), :d] = out.reshape(d, 1).T

        @pl.when(s == c.s_co - 1)
        def _prep_co_acc():
            # last cross-out phase: clear the accumulator for the
            # c_o-projection tiles that start next grid step
            acc[...] = jnp.zeros_like(acc)

    @pl.when(s == c.s_co + c.n_co - 1)
    def _finish_co():
        xr[...] += (acc[:, :d] * co_s_ref[0, 0, :][None, :]
                    + co_b_ref[0, 0, :][None, :])
        y[:, :d] = _ln(xr[:, :d], 2)
        acc[...] = jnp.zeros_like(acc)

    @pl.when(s == c.s_m1 + c.n_m1 - 1)
    def _finish_m1():
        hmid = (acc[:, :f] * m1_s_ref[0, 0, :][None, :]
                + m1_b_ref[0, 0, :][None, :])
        y[:, :f] = _gelu_erf(hmid)                       # [1, f]
        acc[...] = jnp.zeros_like(acc)

    @pl.when(s == c.s_m2 + c.n_m2 - 1)
    def _finish_m2():
        xr[...] += (acc[:, :d] * m2_s_ref[0, 0, :][None, :]
                    + m2_b_ref[0, 0, :][None, :])
        hid_ref[...] = xr[...]


def _clampmap(start: int, n: int):
    """Index map (l, s, pos_ref) -> (l, tile clamped to this phase's
    window): the operand's tile advances only inside its phase, so the
    auto-pipeline fetches each tile exactly once per layer, one grid
    step ahead of its use."""
    def imap(l, s, pos):  # noqa: E741
        del pos
        t = jnp.clip(s - start, 0, n - 1)
        return (l, t, 0)
    return imap


def _layermap(l, s, pos):  # noqa: E741
    del pos, s
    return (l, 0, 0)


def _layermap4(l, s, pos):  # noqa: E741
    del pos, s
    return (l, 0, 0, 0)


def _const2(l, s, pos):  # noqa: E741
    del pos, l, s
    return (0, 0)


@functools.partial(jax.jit, static_argnames=("arch_key", "interpret"))
def _call_kernel(operands, pos, arch_key, interpret=False):
    (x0, lns, qkv_w, qkv_s, qkv_b, o_w, o_s, o_b, cq_w, cq_s, cq_b,
     co_w, co_s, co_b, m1_w, m1_s, m1_b, m2_w, m2_s, m2_b,
     ring_k, ring_v, ring_ks, ring_vs,
     cross_k, cross_v, cross_ks, cross_vs, sel) = operands
    (L, m, d, f, h, dh, t_ring, k_enc, n_align, self_qmax, cross_is_int4,
     align_bf16, tile_bytes, chunk, beams, rows_cross) = arch_key
    sched = make_schedule(d, f, tile_bytes,
                          self_phases=m if beams else 1,
                          cross_phases=m if rows_cross else 1)
    c = sched

    def wspec(w, start, n):
        rows = w.shape[1] // n
        return pl.BlockSpec((1, rows, w.shape[2]), _clampmap(start, n))

    def lspec(x):
        return pl.BlockSpec((1,) + x.shape[1:],
                            _layermap if x.ndim == 3 else _layermap4)

    in_specs = [
        pl.BlockSpec(x0.shape, _const2),                 # x0
        lspec(lns),
        wspec(qkv_w, c.s_qkv, c.n_qkv), lspec(qkv_s), lspec(qkv_b),
        wspec(o_w, c.s_o, c.n_o), lspec(o_s), lspec(o_b),
        wspec(cq_w, c.s_cq, c.n_cq), lspec(cq_s), lspec(cq_b),
        wspec(co_w, c.s_co, c.n_co), lspec(co_s), lspec(co_b),
        wspec(m1_w, c.s_m1, c.n_m1), lspec(m1_s), lspec(m1_b),
        wspec(m2_w, c.s_m2, c.n_m2), lspec(m2_s), lspec(m2_b),
    ]
    def _rowmap(start, nd):
        # per-row blocks: phase r of a band fetches ONLY row r's slice
        # (keeps one ring/cross row, not R of them, in VMEM)
        def imap(l, s, pos):  # noqa: E741
            del pos
            r = jnp.clip(s - start, 0, m - 1)
            return (l, r) + (0,) * (nd - 2)
        return imap

    if beams:
        in_specs += [
            pl.BlockSpec((1, 1, h, dh, t_ring), _rowmap(c.s_selfk, 5)),
            pl.BlockSpec((1, 1, h, dh, t_ring), _rowmap(c.s_selfv, 5)),
            pl.BlockSpec((1, 1, h, t_ring), _rowmap(c.s_selfk, 4)),
            pl.BlockSpec((1, 1, h, t_ring), _rowmap(c.s_selfv, 4)),
        ]
    else:
        in_specs += [lspec(ring_k), lspec(ring_v),
                     lspec(ring_ks), lspec(ring_vs)]
    if rows_cross:
        in_specs += [
            pl.BlockSpec((1, 1, h, dh, k_enc), _rowmap(c.s_crossk, 5)),
            pl.BlockSpec((1, 1, h, dh, k_enc), _rowmap(c.s_crossv, 5)),
            pl.BlockSpec((1, 1, h, k_enc), _rowmap(c.s_crossk, 4)),
            pl.BlockSpec((1, 1, h, k_enc), _rowmap(c.s_crossv, 4)),
        ]
    else:
        in_specs += [lspec(cross_k), lspec(cross_v),
                     lspec(cross_ks), lspec(cross_vs)]
    in_specs += [lspec(sel)]
    # fresh K/V columns leave the kernel in sublane-major COLUMN form
    # ([d, 1] per token; scales [h, 1]) — the [h, dh] view would need a
    # lane split Mosaic rejects; the XLA caller reshapes for free.
    out_shapes = (
        jax.ShapeDtypeStruct((m, d), jnp.float32),               # hid
        jax.ShapeDtypeStruct((n_align, m, k_enc), jnp.float32),  # align
        jax.ShapeDtypeStruct((L, m, d, 1), jnp.int8),            # kcol
        jax.ShapeDtypeStruct((L, m, d, 1), jnp.int8),            # vcol
        jax.ShapeDtypeStruct((L, m, h, 1), jnp.float32),         # ksc
        jax.ShapeDtypeStruct((L, m, h, 1), jnp.float32),         # vsc
    )
    out_specs = (
        pl.BlockSpec((m, d), _const2),
        pl.BlockSpec((n_align, m, k_enc), lambda l, s, pos: (0, 0, 0)),
        pl.BlockSpec((1, m, d, 1), _layermap4),
        pl.BlockSpec((1, m, d, 1), _layermap4),
        pl.BlockSpec((1, m, h, 1), _layermap4),
        pl.BlockSpec((1, m, h, 1), _layermap4),
    )
    t_max = max(t_ring, k_enc)
    wide = max(3 * d, f)
    scratch = [
        pltpu.VMEM((m, d), jnp.float32),          # xr
        pltpu.VMEM((m, wide), jnp.float32),       # y
        pltpu.VMEM((m, wide), jnp.float32),       # acc
        pltpu.VMEM((m, d), jnp.float32),          # qf (flat query rows)
        pltpu.VMEM((m * (-(-h // 8) * 8), t_max), jnp.float32),  # pr (8-aligned bands)
    ]
    kern = functools.partial(
        _kernel, sched=sched, m=m, d=d, f=f, h=h, dh=dh, t_ring=t_ring,
        k_enc=k_enc, n_align=n_align, self_qmax=self_qmax,
        cross_is_int4=cross_is_int4, align_bf16=align_bf16, chunk=chunk,
        beams=beams, rows_cross=rows_cross)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, sched.total),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the M>1 variants' unrolled attention temporaries sit just
            # above the 16M default scoped-VMEM limit at serving shapes
            # (16.39M measured with 15 alignment heads); v5e has 128M
            # physical — raise the budget instead of shrinking tiles
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), *operands)


def _mosaic_aligned(arch) -> bool:
    """Mosaic's machine-code pass requires the dynamic-lane GEMV tile
    offsets to be 128-aligned (verified round 4: tiny d=64 lowers but
    fails the vector.load legalization on chip; large-v3 d=1280 runs).
    In interpret mode (CPU tests) there is no such constraint."""
    return ((arch.d_model % 128 == 0 and arch.decoder_ffn_dim % 128 == 0)
            or _auto_interpret())


def supported(params: Any, arch, cache, key_mask, beam_groups: int,
              position, tokens) -> bool:
    """The gated configuration this kernel implements."""
    dec = params["decoder"]
    lay = dec["layers"]
    return (_mosaic_aligned(arch)
            and tokens.shape[0] == 1
            and jnp.asarray(position).ndim == 0
            and key_mask is None
            and beam_groups == 1
            and "qkv" in lay["self"]
            and "w_q" in lay["self"]["qkv"]
            and "w_q" in lay["mlp"]["fc1"]
            and cache.self_k_scale is not None
            and cache.self_k.dtype == jnp.int8
            and cache.cross_k_scale is not None
            and cache.cross_k.dtype in (jnp.int8, jnp.int4))


def _run_kernel(params: Any, arch, x0, position, cache, align_sel,
                align_dtype, interpret, m: int, beams: bool = False,
                rows: bool = False):
    """Shared operand prep + kernel invocation for an M-token block
    (beams=True: M beam rows at one position, per-row rings; rows=True
    additionally makes the cross cache per-row — M distinct streams).
    Returns (hid [M, d] f32, align [A, M, K] f32,
             kcol/vcol [L, M, h, dh] int8, ksc/vsc [L, M, h] f32)."""
    dec = params["decoder"]
    lay = dec["layers"]
    L = arch.decoder_layers
    h = arch.decoder_attention_heads
    dh = arch.head_dim
    t_ring = cache.self_k.shape[-1]
    k_enc = cache.cross_k.shape[-1]

    lns = jnp.stack([lay["ln1"]["scale"], lay["ln1"]["bias"],
                     lay["ln2"]["scale"], lay["ln2"]["bias"],
                     lay["ln3"]["scale"], lay["ln3"]["bias"]],
                    axis=1).astype(jnp.float32)                  # [L, 6, d]

    def sb(p, extra_scale=None):
        s = p["w_scale"].astype(jnp.float32)          # [L, 1, N]
        b = jnp.broadcast_to(p["b"].astype(jnp.float32)[:, None, :],
                             s.shape)
        if extra_scale is not None:
            s = s * extra_scale
            b = b * extra_scale
        return s, b

    scale = arch.head_dim ** -0.5
    qkv_s, qkv_b = sb(lay["self"]["qkv"])
    o_s, o_b = sb(lay["self"]["o"])
    cq_s, cq_b = sb(lay["cross"]["q"], extra_scale=scale)
    co_s, co_b = sb(lay["cross"]["o"])
    m1_s, m1_b = sb(lay["mlp"]["fc1"])
    m2_s, m2_b = sb(lay["mlp"]["fc2"])

    n_align = align_sel.shape[-1] if align_sel is not None else 1
    sel = (jnp.asarray(align_sel, jnp.float32) if align_sel is not None
           else jnp.zeros((L, h, 1), jnp.float32))

    cross_is_int4 = cache.cross_k.dtype == jnp.int4
    if beams or rows:
        # the M rows are beams/streams: keep the whole [L, R, ...] rings
        # (the row-phase BlockSpecs fetch one row at a time)
        ring_ops = (cache.self_k, cache.self_v,
                    cache.self_k_scale.astype(jnp.float32),
                    cache.self_v_scale.astype(jnp.float32))
    else:
        ring_ops = (cache.self_k[:, 0], cache.self_v[:, 0],
                    cache.self_k_scale[:, 0].astype(jnp.float32),
                    cache.self_v_scale[:, 0].astype(jnp.float32))
    if rows:
        # per-row cross caches too (M distinct streams)
        cross_ops = (cache.cross_k, cache.cross_v,
                     cache.cross_k_scale.astype(jnp.float32),
                     cache.cross_v_scale.astype(jnp.float32))
    else:
        cross_ops = (cache.cross_k[:, 0], cache.cross_v[:, 0],
                     cache.cross_k_scale[:, 0].astype(jnp.float32),
                     cache.cross_v_scale[:, 0].astype(jnp.float32))
    operands = (
        x0, lns,
        lay["self"]["qkv"]["w_q"], qkv_s, qkv_b,
        lay["self"]["o"]["w_q"], o_s, o_b,
        lay["cross"]["q"]["w_q"], cq_s, cq_b,
        lay["cross"]["o"]["w_q"], co_s, co_b,
        lay["mlp"]["fc1"]["w_q"], m1_s, m1_b,
        lay["mlp"]["fc2"]["w_q"], m2_s, m2_b,
        *ring_ops,
        *cross_ops,
        sel,
    )
    # VMEM budget: the M-token variant carries M-row scratch, an [A, M,
    # K] align block, and M*h probability rows on top of the double
    # -buffered weight tiles — shrink its weight tiles (768 -> 512 KB)
    # but keep the attention T-chunks WIDE (1536 = one full cross pass):
    # the scoped-VMEM stack is dominated by unrolled chunk temporaries,
    # so fewer, wider slabs fit where many narrow chunks blew the budget
    # (27M -> 45M with chunk=256; NOTES_ROUND4 finding 6). Runs under a
    # raised 32 MB scoped-VMEM limit (_call_kernel vmem_limit_bytes).
    tile_bytes = 768 * 1024 if m == 1 else 512 * 1024
    chunk = 1536 if m > 1 else 512
    arch_key = (L, m, arch.d_model, arch.decoder_ffn_dim, h, dh, t_ring,
                k_enc, n_align, 127.0, cross_is_int4,
                jnp.dtype(align_dtype) == jnp.bfloat16, tile_bytes, chunk,
                beams, rows)
    hid, align, kcol, vcol, ksc, vsc = _call_kernel(
        operands, position, arch_key, interpret=interpret)
    # kernel emits fresh columns in sublane-major column form
    # ([L, M, d, 1] / scales [L, M, h, 1]); restore the head view here
    # (XLA-land reshape, free)
    return (hid, align,
            kcol.reshape(L, m, h, dh), vcol.reshape(L, m, h, dh),
            ksc[..., 0], vsc[..., 0])


def _lm_head(dec, hid):
    """Final LN + tied LM head (XLA ops, identical to decode_step):
    hid [M, d] f32 -> logits [1, M, V] f32."""
    from ..models.whisper import layer_norm
    act_dtype = dec["tok_emb"].dtype
    x = layer_norm(hid.astype(act_dtype)[None], dec["ln"])
    return jnp.einsum("bsd,vd->bsv", x, dec["tok_emb"].astype(act_dtype),
                      preferred_element_type=jnp.float32)


def decode_step_b1(params: Any, arch, tokens, position, cache,
                   align_sel=None, align_dtype=jnp.float32,
                   interpret: bool | None = None):
    """Drop-in replacement for models/whisper.decode_step at batch 1 in
    the gated serving configuration (see `supported`). Returns
    (logits [1, V] f32, new cache, align_probs [1, A, K] f32).

    interpret=None auto-selects: Mosaic on TPU, interpret mode on the
    CPU backend (tests / multichip dryrun)."""
    if interpret is None:
        interpret = _auto_interpret()
    dec = params["decoder"]
    position = jnp.asarray(position, jnp.int32)
    x0 = (dec["tok_emb"][tokens].astype(jnp.float32)
          + dec["pos_emb"][position][None].astype(jnp.float32))  # [1, d]
    hid, align, kcol, vcol, ksc, vsc = _run_kernel(
        params, arch, x0, position, cache, align_sel, align_dtype,
        interpret, m=1)
    kcol, vcol = kcol[:, 0], vcol[:, 0]
    ksc, vsc = ksc[:, 0], vsc[:, 0]

    # ---- ring column update (ONE batched write per tensor per step) ----
    new_k = jax.lax.dynamic_update_slice(
        cache.self_k, kcol[:, None, :, :, None], (0, 0, 0, 0, position))
    new_v = jax.lax.dynamic_update_slice(
        cache.self_v, vcol[:, None, :, :, None], (0, 0, 0, 0, position))
    new_ks = jax.lax.dynamic_update_slice(
        cache.self_k_scale,
        ksc[:, None, :, None].astype(cache.self_k_scale.dtype),
        (0, 0, 0, position))
    new_vs = jax.lax.dynamic_update_slice(
        cache.self_v_scale,
        vsc[:, None, :, None].astype(cache.self_v_scale.dtype),
        (0, 0, 0, position))
    new_cache = cache._replace(self_k=new_k, self_v=new_v,
                               self_k_scale=new_ks, self_v_scale=new_vs)

    logits = _lm_head(dec, hid)[:, 0]
    align_probs = align[:, 0][None].astype(jnp.float32)  # [1, A, K]
    if align_sel is None:
        align_probs = jnp.zeros((1, 1, cache.cross_k.shape[-1]),
                                jnp.float32)
    return logits, new_cache, align_probs


def decode_step_b1_multi(params: Any, arch, tokens, position, cache,
                         align_sel=None, align_dtype=jnp.float32,
                         interpret: bool | None = None):
    """Batch-1 M-token block step: the kernel analog of
    models/whisper.decode_step_multi for the assisted-decoding VERIFY
    pass (block rows causal among themselves; all M fresh K/V columns
    quantized and written at ring slots [position, position+M)).

    tokens: int32 [1, S]; position: scalar int32. Returns
    (logits [1, S, V] f32, new cache, align_probs [1, A, S, K] f32).

    The verify pass is the whole device cost of draft-free prompt-lookup
    speculation, so this kernel compounds with it: speculation amortizes
    cache reads over the window, the kernel removes the per-op weight
    -stream bubbles of the scanned XLA block step."""
    if interpret is None:
        interpret = _auto_interpret()
    dec = params["decoder"]
    position = jnp.asarray(position, jnp.int32)
    s = tokens.shape[1]
    pos_vec = position + jnp.arange(s)
    x0 = (dec["tok_emb"][tokens[0]].astype(jnp.float32)
          + dec["pos_emb"][pos_vec].astype(jnp.float32))         # [S, d]
    hid, align, kcol, vcol, ksc, vsc = _run_kernel(
        params, arch, x0, position, cache, align_sel, align_dtype,
        interpret, m=s)

    # ---- ring block update: S contiguous columns per tensor ----
    new_k = jax.lax.dynamic_update_slice(
        cache.self_k, jnp.transpose(kcol, (0, 2, 3, 1))[:, None],
        (0, 0, 0, 0, position))
    new_v = jax.lax.dynamic_update_slice(
        cache.self_v, jnp.transpose(vcol, (0, 2, 3, 1))[:, None],
        (0, 0, 0, 0, position))
    new_ks = jax.lax.dynamic_update_slice(
        cache.self_k_scale,
        jnp.transpose(ksc, (0, 2, 1))[:, None]
        .astype(cache.self_k_scale.dtype), (0, 0, 0, position))
    new_vs = jax.lax.dynamic_update_slice(
        cache.self_v_scale,
        jnp.transpose(vsc, (0, 2, 1))[:, None]
        .astype(cache.self_v_scale.dtype), (0, 0, 0, position))
    new_cache = cache._replace(self_k=new_k, self_v=new_v,
                               self_k_scale=new_ks, self_v_scale=new_vs)

    logits = _lm_head(dec, hid)                          # [1, S, V]
    align_probs = align[None].astype(jnp.float32)        # [1, A, S, K]
    if align_sel is None:
        align_probs = jnp.zeros((1, 1, s, cache.cross_k.shape[-1]),
                                jnp.float32)
    return logits, new_cache, align_probs


def supported_beams(params: Any, arch, cache, key_mask, position,
                    tokens) -> bool:
    """Beam-rows gate: R beam hypotheses of ONE stream (batch 1) at a
    shared scalar position — quantized fused weights, int8 per-row self
    rings (beam_decode(self_cache_dtype=int8)), quantized SHARED cross
    cache. R is capped at 8 to bound the R-phase self band's VMEM."""
    dec = params["decoder"]
    lay = dec["layers"]
    return (_mosaic_aligned(arch)
            and tokens.ndim == 1 and 1 < tokens.shape[0] <= 8
            and jnp.asarray(position).ndim == 0
            and key_mask is None
            and "qkv" in lay["self"] and "w_q" in lay["self"]["qkv"]
            and "w_q" in lay["mlp"]["fc1"]
            and cache.self_k_scale is not None
            and cache.self_k.dtype == jnp.int8
            and cache.self_k.shape[1] == tokens.shape[0]
            and cache.cross_k.shape[1] == 1
            and cache.cross_k_scale is not None
            and cache.cross_k.dtype in (jnp.int8, jnp.int4))


def supported_rows(params: Any, arch, cache, key_mask, position,
                   tokens) -> bool:
    """Multi-stream rows gate: R DISTINCT streams (small batch, 2..8) at
    a shared scalar position — quantized fused weights, int8 per-row
    self rings, quantized PER-ROW cross caches. This is the small-batch
    serving regime (compacted seek-loop tails, short interactive files,
    low-concurrency live streams); R is capped at 8 to bound the R-phase
    probability band's VMEM."""
    dec = params["decoder"]
    lay = dec["layers"]
    return (_mosaic_aligned(arch)
            and tokens.ndim == 1 and 1 < tokens.shape[0] <= 8
            and jnp.asarray(position).ndim == 0
            and key_mask is None
            and "qkv" in lay["self"] and "w_q" in lay["self"]["qkv"]
            and "w_q" in lay["mlp"]["fc1"]
            and cache.self_k_scale is not None
            and cache.self_k.dtype == jnp.int8
            and cache.self_k.shape[1] == tokens.shape[0]
            and cache.cross_k.shape[1] == tokens.shape[0]
            and cache.cross_k_scale is not None
            and cache.cross_k.dtype in (jnp.int8, jnp.int4))


def decode_step_b1_beams(params: Any, arch, tokens, position, cache,
                         align_sel=None, align_dtype=jnp.float32,
                         interpret: bool | None = None):
    """decode_step(beam_groups=R) analog at batch 1 on the fused kernel:
    R beam rows advance at ONE shared position, each attending to its
    own self ring, all sharing the cross cache — the hf ASR pipeline's
    default decode (num_beams=5) run as a single whole-step kernel.
    tokens: int32 [R]. Returns (logits [R, V] f32, new cache,
    align_probs [R, A, K] f32) — the shapes beam.py's body consumes.
    Weight streaming is identical to decode_step_b1: beams only add
    query rows, the weight tiles stay batch-invariant."""
    return _decode_step_rowwise(params, arch, tokens, position, cache,
                                align_sel, align_dtype, interpret,
                                rows=False)


def decode_step_rows(params: Any, arch, tokens, position, cache,
                     align_sel=None, align_dtype=jnp.float32,
                     interpret: bool | None = None):
    """Plain decode_step at SMALL BATCH R (2..8 distinct streams, shared
    scalar position) on the fused kernel: per-row self rings AND per-row
    cross caches, each fetched one row per phase. The weight-stream
    bubble analysis transfers from B=1 — rows only add query/attention
    phases while the dominant weight stream stays batch-invariant, so
    the small-batch regime (compacted seek-loop tails, short files,
    low-concurrency serving) keeps the fused kernel's win.
    tokens: int32 [R]. Returns (logits [R, V] f32, new cache,
    align_probs [R, A, K] f32) — greedy.py's body contract."""
    return _decode_step_rowwise(params, arch, tokens, position, cache,
                                align_sel, align_dtype, interpret,
                                rows=True)


def _decode_step_rowwise(params: Any, arch, tokens, position, cache,
                         align_sel, align_dtype, interpret, *,
                         rows: bool):
    if interpret is None:
        interpret = _auto_interpret()
    dec = params["decoder"]
    position = jnp.asarray(position, jnp.int32)
    r = tokens.shape[0]
    x0 = (dec["tok_emb"][tokens].astype(jnp.float32)
          + dec["pos_emb"][position][None].astype(jnp.float32))   # [R, d]
    hid, align, kcol, vcol, ksc, vsc = _run_kernel(
        params, arch, x0, position, cache, align_sel, align_dtype,
        interpret, m=r, beams=True, rows=rows)

    # ---- ring update: R per-row fresh columns at ONE shared slot ----
    new_k = jax.lax.dynamic_update_slice(
        cache.self_k, kcol[..., None], (0, 0, 0, 0, position))
    new_v = jax.lax.dynamic_update_slice(
        cache.self_v, vcol[..., None], (0, 0, 0, 0, position))
    new_ks = jax.lax.dynamic_update_slice(
        cache.self_k_scale,
        ksc[..., None].astype(cache.self_k_scale.dtype),
        (0, 0, 0, position))
    new_vs = jax.lax.dynamic_update_slice(
        cache.self_v_scale,
        vsc[..., None].astype(cache.self_v_scale.dtype),
        (0, 0, 0, position))
    new_cache = cache._replace(self_k=new_k, self_v=new_v,
                               self_k_scale=new_ks, self_v_scale=new_vs)

    logits = _lm_head(dec, hid)[0]                        # [R, V]
    align_probs = jnp.swapaxes(align, 0, 1).astype(jnp.float32)
    if align_sel is None:
        align_probs = jnp.zeros((r, 1, cache.cross_k.shape[-1]),
                                jnp.float32)
    return logits, new_cache, align_probs
