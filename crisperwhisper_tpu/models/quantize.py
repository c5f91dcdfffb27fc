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
    """GROUP-WISE int4: per-(128-input-channel-group, output-channel)
    scales. Plain per-channel int4 loses too much weight precision; group
    scales recover most of it while still halving the per-step weight
    read vs int8. Layout: w_q4 [(L,) G, gsz, d_out] + w_gscale
    [(L,) G, d_out]; models/whisper.dense contracts per group and applies
    the scales on the [.., G, d_out] partials (tiny vs the weight read).

    Backend caveat (measured 2026-08, axon/v5e): s4 arrays cannot be
    passed as jit ARGUMENTS on the axon backend — device_put of an s4
    array that needs relayout hits a "Recursively calling jit"
    RecursionError (even for arrays produced by a jitted program). int4
    weights therefore work (a) on CPU, and (b) on TPU only when the
    quantization runs INSIDE the same jitted program as the consumer.
    The int4 CROSS/SELF caches are unaffected (created in-graph). Serving
    default stays int8 weights."""
    w = p["w"].astype(jnp.float32)
    *lead, d_in, d_out = w.shape
    group_size = min(group_size, d_in)
    assert d_in % group_size == 0, (d_in, group_size)
    g = d_in // group_size
    wg = w.reshape(*lead, g, group_size, d_out)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    w_q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int4)
    out = {"w_q4": w_q, "w_gscale": scale[..., 0, :].astype(jnp.bfloat16)}
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


def dequantize_dense(q: Params) -> jnp.ndarray:
    """Reconstruct the f32 weight from either quantized dense layout
    (int8 per-channel {"w_q","w_scale"} or grouped int4
    {"w_q4","w_gscale"})."""
    if "w_q" in q:
        return q["w_q"].astype(jnp.float32) * q["w_scale"].astype(
            jnp.float32)
    *lead, g, gsz, d_out = q["w_q4"].shape
    deq = (q["w_q4"].astype(jnp.float32)
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
