"""Weight-only int8 quantization for serving.

Decode is HBM-bandwidth-bound: each generated token re-reads every decoder
weight. Per-output-channel symmetric int8 halves that traffic vs bf16
(params ~1.8 GB -> 0.9 GB per step on large-v3). The scale is folded out
of the matmul (models/whisper.dense), so the int8->bf16 convert fuses into
the dot and nothing is materialized.

Scope control: by default only the DECODER's dense weights are quantized —
the encoder runs once per chunk and is MXU-bound, so quantizing it saves
little and risks more. The conv stem, layer norms, embeddings and biases
always stay in full precision.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .whisper import Params

_DENSE_GROUPS = ("q", "k", "v", "o", "fc1", "fc2")


def _quantize_dense(p: Params) -> Params:
    """[d_in, d_out] or stacked [L, d_in, d_out] -> int8 + per-(layer,)
    per-output-channel scale (reduction over d_in only)."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)   # over d_in
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    # scale broadcast shape: [1, d_out] / [L, 1, d_out] — matches the
    # matmul output's trailing axes in dense()
    out = {"w_q": w_q,
           "w_scale": (scale[0] if w.ndim == 2 else scale)
           .astype(jnp.bfloat16)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def fuse_decoder_qkv(params: Params, head_dim: int) -> Params:
    """Fuse the decoder self-attention q/k/v projections into ONE matmul
    and fold the 1/sqrt(head_dim) query scale into its weights.

    Decode is latency-bound on the serial op chain inside the layer scan
    (measured: B=1 costs 3.3 ms/step on large-v3 — dispatch latency, not
    bandwidth); one [d, 3d] matmul replaces three [d, d] dispatches per
    layer. decode_step detects the fused "qkv" entry and skips the
    runtime q-scaling."""
    scale = head_dim ** -0.5
    dec = dict(params["decoder"])
    layers = dict(dec["layers"])
    self_p = layers["self"]
    wq = self_p["q"]["w"] * scale
    wk = self_p["k"]["w"]
    wv = self_p["v"]["w"]
    w = jnp.concatenate([wq, wk, wv], axis=-1)          # [L, d, 3d]
    bq = self_p["q"]["b"] * scale
    bk = self_p["k"].get("b", jnp.zeros_like(bq))
    bv = self_p["v"]["b"]
    b = jnp.concatenate([bq, bk, bv], axis=-1)
    layers["self"] = {"qkv": {"w": w, "b": b}, "o": self_p["o"]}
    dec["layers"] = layers
    return {**params, "decoder": dec}


def _quantize_dense_int4_grouped(p: Params, group_size: int = 128) -> Params:
    """GROUP-WISE int4, NIBBLE-PACKED: per-(128-input-channel-group,
    output-channel) scales. Plain per-channel int4 loses too much weight
    precision; group scales recover most of it while still halving the
    per-step weight read vs int8.

    Storage layout: w_q4 is **uint8** [(L,) G, gsz/2, d_out] — byte j of
    a group packs input channels j (low nibble) and j + gsz/2 (high
    nibble), each an offset-8 unsigned nibble of the clipped [-7, 7]
    value. models/whisper.dense unpacks IN-GRAPH (two shifts + concat on
    the sublane axis — no interleave) and contracts per group, applying
    the scales on the [.., G, d_out] partials (tiny vs the weight read).

    Why packed uint8 rather than jnp.int4: s4 arrays cannot be passed as
    jit ARGUMENTS on the axon backend (device_put of an s4 array needing
    relayout hits a "Recursively calling jit" RecursionError — measured
    2026-08). uint8 crosses every jit boundary, so int4 weights now run
    on the TPU backend too; the unpack is in-graph and fuses into the
    dot's operand read. The int4 CROSS/SELF caches are unaffected
    (created in-graph, never jit arguments)."""
    w = p["w"].astype(jnp.float32)
    *lead, d_in, d_out = w.shape
    group_size = min(group_size, d_in)
    assert d_in % group_size == 0, (d_in, group_size)
    assert group_size % 2 == 0, group_size
    g = d_in // group_size
    wg = w.reshape(*lead, g, group_size, d_out)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    w_q = jnp.clip(jnp.round(wg / scale), -7, 7) + 8.0   # [1, 15]
    half = group_size // 2
    lo = w_q[..., :half, :].astype(jnp.uint8)
    hi = w_q[..., half:, :].astype(jnp.uint8)
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    out = {"w_q4": packed, "w_gscale": scale[..., 0, :].astype(jnp.bfloat16)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_decoder_weights(params: Params, bits: int = 8) -> Params:
    """Return params with the decoder's dense weights quantized (int8
    per-output-channel, or bits=4 for group-wise int4)."""
    quant = (_quantize_dense if bits == 8 else _quantize_dense_int4_grouped)
    dec = dict(params["decoder"])
    layers = dict(dec["layers"])
    for group in ("self", "cross", "mlp"):
        sub = dict(layers[group])
        for name, p in sub.items():
            if isinstance(p, dict) and "w" in p:
                sub[name] = quant(p)
        layers[group] = sub
    dec["layers"] = layers
    return {**params, "decoder": dec}


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """uint8 [(L,) G, gsz/2, d_out] -> int8 [(L,) G, gsz, d_out]:
    low nibbles are channels [0, gsz/2), high nibbles [gsz/2, gsz),
    each offset-8 (see _quantize_dense_int4_grouped)."""
    lo = (packed & jnp.uint8(0x0F)).astype(jnp.int8) - 8
    hi = (packed >> jnp.uint8(4)).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize_dense(q: Params) -> jnp.ndarray:
    """Reconstruct the f32 weight from either quantized dense layout
    (int8 per-channel {"w_q","w_scale"} or nibble-packed grouped int4
    {"w_q4","w_gscale"})."""
    if "w_q" in q:
        return q["w_q"].astype(jnp.float32) * q["w_scale"].astype(
            jnp.float32)
    w_q = unpack_int4(q["w_q4"])
    *lead, g, gsz, d_out = w_q.shape
    deq = (w_q.astype(jnp.float32)
           * q["w_gscale"][..., :, None, :].astype(jnp.float32))
    return deq.reshape(*lead, g * gsz, d_out)


def quantization_error(params: Params, quantized: Params) -> dict[str, Any]:
    """Max relative dequantization error per decoder group (diagnostics;
    supports both the int8 and grouped-int4 layouts)."""
    report = {}
    for group in ("self", "cross", "mlp"):
        orig = params["decoder"]["layers"][group]
        quant = quantized["decoder"]["layers"][group]
        errs = []
        for name in orig:
            if isinstance(orig[name], dict) and "w" in orig[name]:
                w = orig[name]["w"].astype(jnp.float32)
                deq = dequantize_dense(quant[name])
                errs.append(float(jnp.max(jnp.abs(w - deq))
                                  / (jnp.max(jnp.abs(w)) + 1e-9)))
        report[group] = max(errs) if errs else 0.0
    return report
