"""Whisper encoder-decoder as pure-functional JAX, TPU-first.

Re-design of the reference model layer (hf transformers
models/whisper/modeling_whisper.py, cited per-function below) with
TPU-native structure:

  * params are plain pytrees; per-layer weights are STACKED on a leading
    layer axis so both encoder and decoder bodies run as `lax.scan` over
    layers — one traced layer, 32x smaller XLA programs for large-v3.
  * the decoder step is a single-token incremental function against a
    preallocated static KV cache (self-attn ring sized max_target_positions;
    cross-attn K/V computed once from the encoder output, cf.
    modeling_whisper.py:321-346).
  * cross-attention probabilities of the *alignment heads only* are an
    explicit output of the decoder step, selected in-graph by a one-hot
    (layer, head) projection — never "output all attentions then select on
    host" as the reference does (generation_whisper.py:257-264).

Numerics parity (golden-tested): Q is scaled by head_dim**-0.5 *before*
QK^T (modeling_whisper.py:311-316), k_proj has no bias (:282), pre-LN
blocks, exact (erf) GELU, final layer_norm on both stacks, learned decoder
positions indexed by past length (:203-208), proj_out weight tied to the
decoder token embedding (:1168).
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperArch
from ..ops.ring_scatter import write_block_columns_group

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive blocks
# ---------------------------------------------------------------------------


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """LayerNorm computed in f32 regardless of activation dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def dense(x: jax.Array, p: Params) -> jax.Array:
    """x @ w (+ b). Weights stored [d_in, d_out].

    Weight-only int8 layout ({"w_q": int8 [d_in, d_out], "w_scale":
    [d_out]}) is dequantized with the per-output-channel scale folded OUT
    of the matmul — XLA fuses the int8->activation-dtype convert into the
    dot's operand read, so only int8 bytes leave HBM (decode is
    weight-bandwidth-bound; see models/quantize.py)."""
    if "w_q" in p:
        y = jnp.einsum("...i,io->...o", x, p["w_q"].astype(x.dtype),
                       preferred_element_type=x.dtype)
        y = y * p["w_scale"].astype(y.dtype)
    elif "w_q4" in p:
        # group-wise int4, nibble-packed uint8 ({"w_q4": [G, gsz/2,
        # d_out] uint8, "w_gscale": [G, d_out]}): unpack in-graph (fuses
        # into the dot's operand read — models/quantize.unpack_int4),
        # contract per input-channel group, then fold the per-group
        # scales on the [.., G, d_out] partials
        from .quantize import unpack_int4
        w_q = unpack_int4(p["w_q4"])
        g, gsz, _ = w_q.shape
        xg = x.reshape(*x.shape[:-1], g, gsz)
        part = jnp.einsum("...gi,gio->...go", xg,
                          w_q.astype(x.dtype),
                          preferred_element_type=x.dtype)
        y = jnp.einsum("...go,go->...o", part,
                       p["w_gscale"].astype(x.dtype),
                       preferred_element_type=x.dtype)
    else:
        y = jnp.einsum("...i,io->...o", x, p["w"],
                       preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def gelu(x: jax.Array) -> jax.Array:
    # exact erf GELU to match torch.nn.functional.gelu default
    return jax.nn.gelu(x, approximate=False)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[..., T, d] -> [..., H, T, Dh]"""
    *lead, t, d = x.shape
    x = x.reshape(*lead, t, num_heads, d // num_heads)
    return jnp.swapaxes(x, -3, -2)


def _merge_heads(x: jax.Array) -> jax.Array:
    """[..., H, T, Dh] -> [..., T, d]"""
    x = jnp.swapaxes(x, -3, -2)
    *lead, t, h, dh = x.shape
    return x.reshape(*lead, t, h * dh)


def _self_qkv(y: jax.Array, sp: Params, num_heads: int, scale: float
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Project y to head-split (q, k, v); q arrives pre-scaled. Uses the
    fused single-matmul "qkv" entry when present (fuse_decoder_qkv)."""
    if "qkv" in sp:
        qkv = dense(y, sp["qkv"])
        d = qkv.shape[-1] // 3
        return (_split_heads(qkv[..., :d], num_heads),
                _split_heads(qkv[..., d:2 * d], num_heads),
                _split_heads(qkv[..., 2 * d:], num_heads))
    return (_split_heads(dense(y, sp["q"]) * scale, num_heads),
            _split_heads(dense(y, sp["k"]), num_heads),
            _split_heads(dense(y, sp["v"]), num_heads))


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: jax.Array | None = None,
              probs_dtype: jnp.dtype = jnp.float32
              ) -> tuple[jax.Array, jax.Array]:
    """Scaled dot-product attention over head-split tensors.

    q/k/v: [..., H, Tq/Tk, Dh]. Q pre-scaled by caller (parity with
    modeling_whisper.py:311-316). Softmax in f32. Returns (out, probs).
    """
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...hqk,...hkd->...hqd", probs.astype(v.dtype), v,
                     preferred_element_type=v.dtype)
    return out, probs.astype(probs_dtype)


def use_fused_attention() -> bool:
    """Pallas fused attention on real TPU backends (env-overridable)."""
    import os
    flag = os.environ.get("CW_FUSED_ATTENTION")
    if flag is not None:
        return flag not in ("0", "false", "off")
    from ..ops.fused_attention import supports_pallas
    return supports_pallas()


def self_attention_block(x: jax.Array, p: Params, num_heads: int,
                         mask: jax.Array | None = None) -> jax.Array:
    scale = (x.shape[-1] // num_heads) ** -0.5
    q = _split_heads(dense(x, p["q"]) * scale, num_heads)
    k = _split_heads(dense(x, p["k"]), num_heads)
    v = _split_heads(dense(x, p["v"]), num_heads)
    if mask is None and use_fused_attention():
        from ..ops.fused_attention import fused_attention
        out = fused_attention(q, k, v)
    else:
        out, _ = attention(q, k, v, mask)
    return dense(_merge_heads(out), p["o"])


def mlp_block(x: jax.Array, p: Params) -> jax.Array:
    return dense(gelu(dense(x, p["fc1"])), p["fc2"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal positions (modeling_whisper.py:54)."""
    log_timescale_increment = math.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment *
                            np.arange(channels // 2, dtype=np.float64))
    scaled_time = (np.arange(length, dtype=np.float64)[:, None] *
                   inv_timescales[None, :])
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)],
                          axis=1).astype(np.float32)


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array,
            stride: int) -> jax.Array:
    """[B, C_in, T] conv with kernel [k, C_in, C_out], SAME-style padding=1."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NCH", "HIO", "NCH"),
        preferred_element_type=x.dtype)
    return y + b[None, :, None].astype(y.dtype)


def _encoder_layer(x: jax.Array, lp: Params, num_heads: int) -> jax.Array:
    # pre-LN self-attn + pre-LN MLP (modeling_whisper.py:372-432)
    x = x + self_attention_block(layer_norm(x, lp["ln1"]), lp["attn"],
                                 num_heads)
    x = x + mlp_block(layer_norm(x, lp["ln2"]), lp["mlp"])
    return x


def encode(params: Params, arch: WhisperArch,
           input_features: jax.Array) -> jax.Array:
    """[B, n_mels, 3000] log-mel -> [B, 1500, d] encoder states.

    Parity: WhisperEncoder.forward (modeling_whisper.py:632-730) — conv
    stem with GELUs, unconditional sinusoid add, pre-LN layers, final LN.
    The encoder requires exactly 3000 input frames (:668-672).
    """
    enc = params["encoder"]
    if input_features.shape[-1] != 2 * arch.max_source_positions:
        raise ValueError("encoder requires exactly "
                         f"{2 * arch.max_source_positions} mel frames")
    x = input_features.astype(enc["conv1"]["w"].dtype)
    x = gelu(_conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], stride=1))
    x = gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2))
    x = jnp.swapaxes(x, -2, -1)                      # [B, 1500, d]
    x = x + enc["pos"].astype(x.dtype)

    def body(h, lp):
        return _encoder_layer(h, lp, arch.encoder_attention_heads), None

    x, _ = jax.lax.scan(body, x, enc["layers"])
    return layer_norm(x, enc["ln_post"])


# Jitted encoder entry (static arch). The serving seek loop dispatches
# one encode per 30 s window batch — calling the eager function instead
# pays per-op dispatch round-trips for the whole 32-layer stack
# (measured: 8.5 s/window at B=96 over a remote-dispatch link vs ~1.6 s
# jitted; round-5 probe).
encode_jit = functools.partial(jax.jit, static_argnames=("arch",))(encode)


# ---------------------------------------------------------------------------
# Decoder with static KV cache and in-graph alignment-head capture
# ---------------------------------------------------------------------------


class DecoderCache(NamedTuple):
    """Static-shape decode state, stored SEQUENCE-LAST.

    self_k/self_v: [L, B, H, Dh, max_target]; cross_k/cross_v:
    [L, B, H, Dh, K_enc] (computed once at step 0 — the
    modeling_whisper.py:321-346 `is_updated` logic made structural).

    Layout rationale: TPU tiles the last two dims to (sublane, 128 lanes).
    A head-dim-last layout [.., T, 64] pads 64 -> 128 lanes, DOUBLING both
    HBM footprint and per-step read traffic of the decode bottleneck;
    sequence-last keeps the 128-lane axis ~full (1500 -> 1536).

    cross_k_scale/cross_v_scale: [L, B, H, K_enc] per-position dequant
    scales when the cross cache is int8/int4. None => cross is bf16/f32.
    self_k_scale/self_v_scale: [L, B, H, max_target] per-position scales
    when the SELF ring is quantized (new columns are quantized over Dh as
    they are written). None => self is bf16/f32.
    Scale layout note: scales deliberately carry NO singleton axis — a
    trailing [.., 1, T] shape puts 1 on the sublane axis, which TPU tiling
    pads to the tile height (16 for bf16): a 16x storage AND per-step read
    blow-up on tensors that are touched every decode step.
    """
    self_k: jax.Array
    self_v: jax.Array
    cross_k: jax.Array
    cross_v: jax.Array
    cross_k_scale: jax.Array | None = None
    cross_v_scale: jax.Array | None = None
    self_k_scale: jax.Array | None = None
    self_v_scale: jax.Array | None = None


def _quantize(x: jax.Array, axis: int, qmax: float, dtype: jnp.dtype
              ) -> tuple[jax.Array, jax.Array]:
    """Symmetric integer quantization over `axis`:
    returns (q, scale with axis kept=1)."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(dtype)
    return q, scale.astype(jnp.bfloat16)


def _quantize_int8(x: jax.Array, axis: int = -1
                   ) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 over `axis`: returns (q, scale with axis kept=1)."""
    return _quantize(x, axis, 127.0, jnp.int8)


def init_cache(params: Params, arch: WhisperArch, encoder_out: jax.Array,
               dtype: jnp.dtype | None = None,
               cross_dtype: jnp.dtype | None = None,
               cache_len: int | None = None,
               self_batch: int | None = None,
               self_dtype: jnp.dtype | None = None) -> DecoderCache:
    """cross_dtype=jnp.int8 / jnp.int4 enables the quantized cross cache
    (int4 halves the decode loop's dominant HBM read; s4 arrays must stay
    inside one jitted program on this backend — they do: the cache never
    crosses the decode program's boundary).
    self_dtype=jnp.int8 / jnp.int4 likewise quantizes the SELF ring:
    decode_step quantizes each new K/V column over Dh as it is written
    and folds the per-position scales outside the dots (same scheme as
    the cross cache).
    cache_len sizes the self-attention ring (default max_target_positions;
    decode is HBM-bound, so allocating only prompt+max_new saves traffic).
    self_batch sizes the self ring's batch independently of the encoder
    batch — beam search shares cross-K/V across beams (self_batch = B*NB
    with encoder_out batch B; see decode_step(beam_groups=...))."""
    dec = params["decoder"]
    b = self_batch if self_batch is not None else encoder_out.shape[0]
    h = arch.decoder_attention_heads
    dh = arch.head_dim
    dtype = dtype or encoder_out.dtype
    cache_len = cache_len or arch.max_target_positions
    quantize = cross_dtype in (jnp.int8, jnp.int4)
    qmax = 7.0 if cross_dtype == jnp.int4 else 127.0

    def per_layer_cross(lp):
        # [B, H, Dh, K]; per-layer quantization here keeps the full-stack
        # bf16 cross tensor from ever materializing
        k = jnp.swapaxes(_split_heads(dense(encoder_out, lp["cross"]["k"]),
                                      h), -1, -2)
        v = jnp.swapaxes(_split_heads(dense(encoder_out, lp["cross"]["v"]),
                                      h), -1, -2)
        if quantize:
            kq, ks = _quantize(k.astype(jnp.float32), -2, qmax, cross_dtype)
            vq, vs = _quantize(v.astype(jnp.float32), -2, qmax, cross_dtype)
            return kq, ks[:, :, 0, :], vq, vs[:, :, 0, :]
        return k.astype(dtype), v.astype(dtype)

    shape = (arch.decoder_layers, b, h, dh, cache_len)
    if self_dtype in (jnp.int8, jnp.int4):
        self_kwargs = dict(
            self_k=jnp.zeros(shape, self_dtype),
            self_v=jnp.zeros(shape, self_dtype),
            self_k_scale=jnp.zeros((arch.decoder_layers, b, h, cache_len),
                                   jnp.bfloat16),
            self_v_scale=jnp.zeros((arch.decoder_layers, b, h, cache_len),
                                   jnp.bfloat16))
    else:
        self_kwargs = dict(self_k=jnp.zeros(shape, dtype),
                           self_v=jnp.zeros(shape, dtype))
    if quantize:
        kq, ks, vq, vs = jax.lax.map(per_layer_cross, dec["layers"])
        return DecoderCache(cross_k=kq, cross_v=vq,
                            cross_k_scale=ks, cross_v_scale=vs,
                            **self_kwargs)
    cross_k, cross_v = jax.lax.map(per_layer_cross, dec["layers"])
    return DecoderCache(cross_k=cross_k, cross_v=cross_v, **self_kwargs)


def alignment_selector(arch: WhisperArch,
                       alignment_heads: tuple[tuple[int, int], ...]
                       ) -> np.ndarray:
    """One-hot [L, H, A] projector mapping per-layer per-head cross-attn
    probabilities to the A selected alignment heads, applied inside the
    layer scan (replaces host-side selection at generation_whisper.py:263)."""
    sel = np.zeros((arch.decoder_layers, arch.decoder_attention_heads,
                    max(len(alignment_heads), 1)), np.float32)
    for a, (layer, head) in enumerate(alignment_heads):
        sel[layer, head, a] = 1.0
    return sel


def decode_step(params: Params, arch: WhisperArch, tokens: jax.Array,
                position: jax.Array, cache: DecoderCache,
                align_sel: jax.Array | None = None,
                key_mask: jax.Array | None = None,
                beam_groups: int = 1,
                align_dtype: jnp.dtype = jnp.float32,
                pos_offset: jax.Array | None = None,
                ablate: frozenset[str] = frozenset()
                ) -> tuple[jax.Array, DecoderCache, jax.Array]:
    """One incremental decoder step.

    Args:
      tokens: int32 [B] current input token per row.
      position: scalar int32 — current position (same for all rows;
        prompts are fed through the same step function) — OR int32 [B]
        per-row positions (batched assisted decoding, where rows commit
        different token counts per window). The scalar form keeps the
        fast dynamic-update-slice cache write; the vector form scatters
        each row's new K/V column at its own ring slot.
      cache: DecoderCache to read/update.
      align_sel: optional [L, H, A] one-hot alignment-head projector.
      key_mask: optional bool [B, cache_len] — positions a row may attend
        to (False for left-pad slots of a conditioned prompt; the
        decoder_attention_mask analog of hf _prepare_decoder_input_ids
        :1936-1938). Positions still advance over pads, as in the
        reference.
      pos_offset: optional int32 [B] — per-row offset subtracted from
        `position` for the LEARNED-POSITION lookup only (ring slots,
        causal mask, and cache writes still use `position` unchanged).
        This implements HF's mask-aware `decoder_position_ids`
        (cumsum(mask)-1: left-pad slots consume NO positions), i.e. the
        padding='longest' dynamic condition-on-prev mode
        (hf generation/utils.py prepare_inputs_for_generation
        "Create missing position_ids on the fly"). Caller contract:
        position - pos_offset[b] >= 0 for every row this step runs on
        (the decode loop only runs at position >= P-1 > max offset).
      beam_groups: when > 1 the B rows are NB consecutive beams per source
        item and the CROSS cache holds one copy per item ([.., B/NB, ..]):
        beams ride the cross-attention as extra query positions, so the
        encoder K/V is never expanded per beam (the reference expands it,
        hf generation expand_inputs; this saves NBx cross-cache memory).
      ablate: PERF-DIAGNOSTIC ONLY — sublayers to skip, any of
        {"self", "cross", "mlp", "lmhead", "selfwrite"} ("selfwrite"
        keeps the self sublayer but skips the per-layer ring scatters,
        isolating their cost). Skipped sublayers contribute
        nothing (their HBM traffic disappears); outputs keep their shapes
        and stay data-dependent on the remaining compute so XLA cannot
        dead-code the loop. Used by scripts/dec_split_bench.py to
        attribute per-step decode cost. Never set in serving paths.
    Returns:
      (logits [B, vocab] f32, new cache, align_probs [B, A, 1500] f32 —
       zeros when align_sel is None).
    """
    dec = params["decoder"]
    h = arch.decoder_attention_heads
    b = tokens.shape[0]
    quantized = cache.cross_k_scale is not None
    self_quant = cache.self_k_scale is not None
    # activation dtype: the self ring's dtype unless that ring is an int
    # cache, in which case activations follow the (unquantized) embedding
    dtype = dec["tok_emb"].dtype if self_quant else cache.self_k.dtype
    self_qmax = 7.0 if cache.self_k.dtype == jnp.int4 else 127.0

    position = jnp.asarray(position, jnp.int32)
    vector_pos = position.ndim > 0                    # per-row positions

    x = dec["tok_emb"][tokens].astype(dtype)          # [B, d]
    # learned pos (:203-208). Positions are in-bounds by caller contract
    # (assisted_decode bounds its spec overshoot at entry); do NOT clamp
    # here — jnp.minimum on the while-loop position scalar breaks XLA's
    # in-place ring aliasing on TPU (measured: 19.3 -> 454 ms/step).
    # pos_offset feeds ONLY this embedding gather — a separate derived
    # value, so the ring-write index chain stays arithmetic-free.
    emb_pos = position if pos_offset is None else position - pos_offset
    x = x + dec["pos_emb"][emb_pos].astype(dtype)
    x = x[:, None, :]                                 # [B, 1, d]

    # causal mask over cache positions: attend to <= position
    pos_ids = jnp.arange(cache.self_k.shape[-1])
    if vector_pos:
        self_mask = (pos_ids[None, :] <=
                     position[:, None])[:, None, None, :]
    else:
        self_mask = (pos_ids <= position)[None, None, None, :]
    if key_mask is not None:
        self_mask = self_mask & key_mask[:, None, None, :]

    n_align = align_sel.shape[-1] if align_sel is not None else 1
    scale = arch.head_dim ** -0.5

    # The full cache rides the scan CARRY with per-layer in-place slice
    # updates — XLA aliases carry buffers, so each step writes only the
    # new [B, H, Dh, 1] column instead of materializing stacked multi-GB
    # scan outputs (the naive ys formulation copies the whole cache every
    # token and dominates decode time). int8 dequantization happens via
    # per-position scales folded OUTSIDE the dots, so the int8->bf16
    # convert fuses into the dot's operand read.

    def seq_last_attention(q, k_dk, v_dk, mask=None,
                           k_scale=None, v_scale=None):
        """Attention over sequence-last K/V: q [B,H,Tq,Dh],
        k_dk/v_dk [B,H,Dh,T] (+ optional int8 per-position scales
        [B,H,1,T] folded outside the dots). Returns (out [B,H,Tq,Dh],
        probs [B,H,Tq,T] f32).

        An int8 x int8 MXU reformulation (quantize q and prob rows,
        native-int dots, scales folded on int32 partials) was built and
        measured on chip in round 5 — REFUTED: cross-attention is a wash
        and W8A8 dense LOSES 1.56x in-context. The dequant-into-dot VPU
        formulation below remains the measured optimum
        (experiments/decode_int8_mxu.py + experiments/README.md)."""
        s = jnp.einsum("bhqd,bhdt->bhqt", q, k_dk.astype(q.dtype),
                       preferred_element_type=jnp.float32)
        if k_scale is not None:
            s = s * k_scale.astype(jnp.float32)[:, :, None, :]
        if mask is not None:
            s = jnp.where(mask, s, jnp.float32(-1e9))
        p = jax.nn.softmax(s, axis=-1)
        pv = (p if v_scale is None
              else p * v_scale.astype(jnp.float32)[:, :, None, :])
        out = jnp.einsum("bhqt,bhdt->bhqd", pv.astype(q.dtype),
                         v_dk.astype(q.dtype),
                         preferred_element_type=jnp.float32)
        return out.astype(q.dtype), p

    def body(carry, layer_in):
        if self_quant:
            hidden, self_k, self_v, self_ks, self_vs = carry
        else:
            hidden, self_k, self_v = carry
        li, lp, layer_cross_k, layer_cross_v, kv_scales, sel = layer_in
        if "self" not in ablate:
            # --- self-attention against the ring cache (sequence-last)
            y = layer_norm(hidden, lp["ln1"])
            q, k_new, v_new = _self_qkv(y, lp["self"], h, scale)
            # k_new/v_new: [B, H, 1, Dh] -> column [B, H, Dh, 1] at
            # `position`
            k_col = jnp.swapaxes(k_new, -1, -2)
            v_col = jnp.swapaxes(v_new, -1, -2)
            skip_write = "selfwrite" in ablate     # PERF-DIAGNOSTIC ONLY
            if self_quant:
                # quantize the new column over Dh; per-position scales are
                # folded outside the dots exactly like the cross cache
                k_col, k_sc = _quantize(k_col.astype(jnp.float32), -2,
                                        self_qmax, self_k.dtype)
                v_col, v_sc = _quantize(v_col.astype(jnp.float32), -2,
                                        self_qmax, self_v.dtype)
                if skip_write or vector_pos:
                    pass                  # vector form: grouped write below
                else:
                    self_ks = jax.lax.dynamic_update_slice(
                        self_ks, k_sc[None, :, :, 0, :], (li, 0, 0, position))
                    self_vs = jax.lax.dynamic_update_slice(
                        self_vs, v_sc[None, :, :, 0, :], (li, 0, 0, position))
            else:
                k_col = k_col.astype(dtype)
                v_col = v_col.astype(dtype)
            if skip_write:
                pass
            elif vector_pos:
                # per-row single-column writes (the assisted draft chain
                # at batch > 1) — strategy-dispatched like the S-column
                # verify-block writes (ops/ring_scatter.py)
                pairs = [(self_k, k_col), (self_v, v_col)]
                if self_quant:
                    pairs += [(self_ks, k_sc[:, :, 0, :]),
                              (self_vs, v_sc[:, :, 0, :])]
                written = write_block_columns_group(pairs, li, position)
                self_k, self_v = written[0], written[1]
                if self_quant:
                    self_ks, self_vs = written[2], written[3]
            else:
                self_k = jax.lax.dynamic_update_slice(
                    self_k, k_col[None], (li, 0, 0, 0, position))
                self_v = jax.lax.dynamic_update_slice(
                    self_v, v_col[None], (li, 0, 0, 0, position))
            k_all = jax.lax.dynamic_index_in_dim(self_k, li, 0,
                                                 keepdims=False)
            v_all = jax.lax.dynamic_index_in_dim(self_v, li, 0,
                                                 keepdims=False)
            if self_quant:
                attn_out, _ = seq_last_attention(
                    q, k_all, v_all, self_mask,
                    k_scale=jax.lax.dynamic_index_in_dim(
                        self_ks, li, 0, keepdims=False),
                    v_scale=jax.lax.dynamic_index_in_dim(
                        self_vs, li, 0, keepdims=False))
            else:
                attn_out, _ = seq_last_attention(q, k_all, v_all,
                                                 self_mask)
            if skip_write:
                # keep the unwritten column live (diagnostic mode): a
                # ~1e-30-scaled scalar of the quantized column folds into
                # the output so XLA can't DCE the quantize/column work
                dep = (k_col.astype(jnp.float32).sum()
                       + v_col.astype(jnp.float32).sum())
                if self_quant:
                    dep = dep + k_sc.sum() + v_sc.sum()
                attn_out = attn_out + (dep * 1e-30).astype(attn_out.dtype)
            hidden = hidden + dense(_merge_heads(attn_out), lp["self"]["o"])
        if "cross" not in ablate:
            # --- cross-attention against cached encoder K/V
            y = layer_norm(hidden, lp["ln2"])
            qc = _split_heads(dense(y, lp["cross"]["q"]) * scale, h)
            if beam_groups > 1:
                # [B, H, 1, Dh] -> [B/NB, H, NB, Dh]: beams share the
                # item's K/V as extra query rows
                b0 = b // beam_groups
                qc = jnp.swapaxes(
                    qc[:, :, 0, :].reshape(b0, beam_groups, h,
                                           arch.head_dim),
                    1, 2)
            cross_out, probs_full = seq_last_attention(
                qc, layer_cross_k, layer_cross_v,
                k_scale=kv_scales[0] if quantized else None,
                v_scale=kv_scales[1] if quantized else None)
            cross_out = cross_out.astype(hidden.dtype)
            if beam_groups > 1:
                # [B/NB, H, NB, Dh] -> [B, H, 1, Dh]; probs likewise
                cross_out = jnp.swapaxes(cross_out, 1, 2).reshape(
                    b, h, 1, arch.head_dim)
                probs_row = jnp.swapaxes(probs_full, 1, 2).reshape(
                    b, h, probs_full.shape[-1])
            else:
                probs_row = probs_full[:, :, 0, :]
            hidden = hidden + dense(_merge_heads(cross_out), lp["cross"]["o"])
            # in-graph alignment-head selection: [B,H,K] x [H,A] -> [B,A,K].
            # Stacked in align_dtype (bf16 in serving): the selector is
            # one-hot, so each align head has EXACTLY ONE contributing layer
            # and the cross-layer sum below is exact in any dtype — stacking
            # bf16 halves this per-step scan-output traffic.
            aligned = jnp.einsum("bhk,ha->bak", probs_row, sel,
                                 preferred_element_type=jnp.float32
                                 ).astype(align_dtype)
        else:
            # keep a data dependency on `hidden` so the loop can't be DCE'd
            aligned = (hidden[:, :1, 0] * 0).astype(align_dtype)[:, :, None] \
                + jnp.zeros((b, n_align, cache.cross_k.shape[-1]),
                            align_dtype)
        if "mlp" not in ablate:
            # --- MLP
            hidden = hidden + mlp_block(layer_norm(hidden, lp["ln3"]),
                                        lp["mlp"])
        if self_quant:
            return (hidden, self_k, self_v, self_ks, self_vs), aligned
        return (hidden, self_k, self_v), aligned

    sel = (jnp.asarray(align_sel) if align_sel is not None
           else jnp.zeros((arch.decoder_layers, h, 1), jnp.float32))
    layer_ids = jnp.arange(arch.decoder_layers)
    kv_scales = ((cache.cross_k_scale, cache.cross_v_scale) if quantized
                 else (layer_ids, layer_ids))        # dummy xs when bf16
    carry0 = (x, cache.self_k, cache.self_v)
    if self_quant:
        carry0 = carry0 + (cache.self_k_scale, cache.self_v_scale)
    final_carry, aligned = jax.lax.scan(
        body, carry0,
        (layer_ids, dec["layers"], cache.cross_k, cache.cross_v,
         kv_scales, sel))
    if self_quant:
        x, new_k, new_v, new_ks, new_vs = final_carry
    else:
        x, new_k, new_v = final_carry

    x = layer_norm(x, dec["ln"])
    if "lmhead" in ablate:
        # diagnostic: skip the [d, vocab] tok_emb read but keep the
        # logits data-dependent on the decoder output
        logits = jnp.pad(x[:, 0, :].astype(jnp.float32),
                         ((0, 0), (0, arch.vocab_size - x.shape[-1])))
    else:
        # weight-tied LM head (modeling_whisper.py:1168)
        logits = jnp.einsum("bd,vd->bv", x[:, 0, :],
                            dec["tok_emb"].astype(dtype),
                            preferred_element_type=jnp.float32)
    align_probs = jnp.sum(aligned, axis=0)            # [B, A, 1500]
    if align_probs.dtype != jnp.float32:
        align_probs = align_probs.astype(jnp.float32)
    new_cache = cache._replace(self_k=new_k, self_v=new_v)
    if self_quant:
        new_cache = new_cache._replace(self_k_scale=new_ks,
                                       self_v_scale=new_vs)
    return logits, new_cache, align_probs


def decode_step_multi(params: Params, arch: WhisperArch, tokens: jax.Array,
                      position: jax.Array, cache: DecoderCache,
                      align_sel: jax.Array | None = None,
                      key_mask: jax.Array | None = None,
                      align_dtype: jnp.dtype = jnp.float32,
                      pos_offset: jax.Array | None = None
                      ) -> tuple[jax.Array, DecoderCache, jax.Array]:
    """S-token incremental decoder step (block prefill / verify pass).

    Generalizes decode_step to a [B, S] token block at positions
    [position, position + S): writes all S K/V columns, then attends with
    a causal-within-block mask against the ring. Used for (a) one-shot
    prompt prefill — a conditioned prompt (hf _prepare_decoder_input_ids,
    generation_whisper.py:1875-1941) costs ONE step instead of P serial
    steps — and (b) the verification forward of assisted decoding
    (modeling_whisper.py:1359 WhisperForCausalLM's consumer).

    `position` may be a scalar (all rows at the same offset) or int32
    [B] per-row offsets (batched assisted decoding): row b's block lands
    at ring slots [position[b], position[b] + S).

    `pos_offset` (optional int32 [B]) shifts the LEARNED-POSITION lookup
    only — see decode_step: it realizes HF's mask-aware
    decoder_position_ids for left-padded 'longest' conditioned prompts.
    Ring slots below the offset are pad slots (key_mask False); their
    lookup index is clamped to 0 — the clamp lives on this standalone
    embedding-gather index, never on the ring-write index chain (the
    TPU aliasing landmine measured in round 3).

    Returns (logits [B, S, vocab] f32, new cache,
             align_probs [B, A, S, K] f32).
    """
    dec = params["decoder"]
    h = arch.decoder_attention_heads
    b, s = tokens.shape
    quantized = cache.cross_k_scale is not None
    self_quant = cache.self_k_scale is not None
    dtype = dec["tok_emb"].dtype if self_quant else cache.self_k.dtype
    self_qmax = 7.0 if cache.self_k.dtype == jnp.int4 else 127.0

    position = jnp.asarray(position, jnp.int32)
    vector_pos = position.ndim > 0                         # per-row offsets

    x = dec["tok_emb"][tokens].astype(dtype)               # [B, S, d]
    if vector_pos:
        pos_vec = position[:, None] + jnp.arange(s)[None, :]   # [B, S]
    else:
        pos_vec = position + jnp.arange(s)                     # [S]
    # positions are guaranteed in-bounds by callers (assisted_decode
    # validates prompt + max_new + spec_len - 1 <= max_target_positions;
    # a clamp here is NOT an option: jnp.minimum on the position scalar
    # measurably breaks XLA's in-place ring aliasing on TPU — a 23x
    # decode regression was measured with it in decode_step).
    # pos_offset: clamp ONLY the standalone embedding-gather index (pad
    # slots sit below the offset; key_mask hides them from attention,
    # so any in-bounds embedding value is fine) — pos_vec itself stays
    # untouched for the ring mask and cache writes below.
    if pos_offset is None:
        emb_vec = pos_vec
    else:
        pv = pos_vec if vector_pos else pos_vec[None, :]
        emb_vec = jnp.maximum(pv - pos_offset[:, None], 0)     # [B, S]
    x = x + dec["pos_emb"][emb_vec].astype(dtype)

    # causal-within-block mask over ring positions: query at block row i
    # (absolute position position+i) attends to pos <= position+i
    ring_ids = jnp.arange(cache.self_k.shape[-1])
    if vector_pos:
        self_mask = (ring_ids[None, None, None, :] <=
                     pos_vec[:, None, :, None])            # [B, 1, S, T]
    else:
        self_mask = (ring_ids[None, None, None, :] <=
                     pos_vec[None, None, :, None])
    if key_mask is not None:
        self_mask = self_mask & key_mask[:, None, None, :]

    scale = arch.head_dim ** -0.5

    def seq_last_attention(q, k_dk, v_dk, mask=None,
                           k_scale=None, v_scale=None):
        sc = jnp.einsum("bhqd,bhdt->bhqt", q, k_dk.astype(q.dtype),
                        preferred_element_type=jnp.float32)
        if k_scale is not None:
            sc = sc * k_scale.astype(jnp.float32)[:, :, None, :]
        if mask is not None:
            sc = jnp.where(mask, sc, jnp.float32(-1e9))
        p = jax.nn.softmax(sc, axis=-1)
        pv = (p if v_scale is None
              else p * v_scale.astype(jnp.float32)[:, :, None, :])
        out = jnp.einsum("bhqt,bhdt->bhqd", pv.astype(q.dtype),
                         v_dk.astype(q.dtype),
                         preferred_element_type=jnp.float32)
        return out.astype(q.dtype), p

    def body(carry, layer_in):
        if self_quant:
            hidden, self_k, self_v, self_ks, self_vs = carry
        else:
            hidden, self_k, self_v = carry
        li, lp, layer_cross_k, layer_cross_v, kv_scales, sel = layer_in
        y = layer_norm(hidden, lp["ln1"])
        q, k_new, v_new = _self_qkv(y, lp["self"], h, scale)
        # k_new/v_new: [B, H, S, Dh] -> block [B, H, Dh, S] at `position`
        k_blk = jnp.swapaxes(k_new, -1, -2)
        v_blk = jnp.swapaxes(v_new, -1, -2)
        if self_quant:
            k_blk, k_sc = _quantize(k_blk.astype(jnp.float32), -2,
                                    self_qmax, self_k.dtype)
            v_blk, v_sc = _quantize(v_blk.astype(jnp.float32), -2,
                                    self_qmax, self_v.dtype)
            if not vector_pos:
                self_ks = jax.lax.dynamic_update_slice(
                    self_ks, k_sc[None, :, :, 0, :], (li, 0, 0, position))
                self_vs = jax.lax.dynamic_update_slice(
                    self_vs, v_sc[None, :, :, 0, :], (li, 0, 0, position))
        else:
            k_blk = k_blk.astype(dtype)
            v_blk = v_blk.astype(dtype)
        if vector_pos:
            # per-row contiguous S-column writes (batched speculation) —
            # strategy-dispatched: XLA scatter / per-row DUS / Pallas DMA
            # (ops/ring_scatter.py, CW_RING_SCATTER env)
            pairs = [(self_k, k_blk), (self_v, v_blk)]
            if self_quant:
                pairs += [(self_ks, k_sc[:, :, 0, :]),
                          (self_vs, v_sc[:, :, 0, :])]
            written = write_block_columns_group(pairs, li, position)
            self_k, self_v = written[0], written[1]
            if self_quant:
                self_ks, self_vs = written[2], written[3]
        else:
            self_k = jax.lax.dynamic_update_slice(
                self_k, k_blk[None], (li, 0, 0, 0, position))
            self_v = jax.lax.dynamic_update_slice(
                self_v, v_blk[None], (li, 0, 0, 0, position))
        k_all = jax.lax.dynamic_index_in_dim(self_k, li, 0, keepdims=False)
        v_all = jax.lax.dynamic_index_in_dim(self_v, li, 0, keepdims=False)
        if self_quant:
            attn_out, _ = seq_last_attention(
                q, k_all, v_all, self_mask,
                k_scale=jax.lax.dynamic_index_in_dim(
                    self_ks, li, 0, keepdims=False),
                v_scale=jax.lax.dynamic_index_in_dim(
                    self_vs, li, 0, keepdims=False))
        else:
            attn_out, _ = seq_last_attention(q, k_all, v_all, self_mask)
        hidden = hidden + dense(_merge_heads(attn_out), lp["self"]["o"])
        y = layer_norm(hidden, lp["ln2"])
        qc = _split_heads(dense(y, lp["cross"]["q"]) * scale, h)
        cross_out, probs = seq_last_attention(
            qc, layer_cross_k, layer_cross_v,
            k_scale=kv_scales[0] if quantized else None,
            v_scale=kv_scales[1] if quantized else None)
        hidden = hidden + dense(_merge_heads(cross_out.astype(hidden.dtype)),
                                lp["cross"]["o"])
        aligned = jnp.einsum("bhsk,ha->bask", probs, sel,
                             preferred_element_type=jnp.float32
                             ).astype(align_dtype)
        hidden = hidden + mlp_block(layer_norm(hidden, lp["ln3"]), lp["mlp"])
        if self_quant:
            return (hidden, self_k, self_v, self_ks, self_vs), aligned
        return (hidden, self_k, self_v), aligned

    sel = (jnp.asarray(align_sel) if align_sel is not None
           else jnp.zeros((arch.decoder_layers, h, 1), jnp.float32))
    layer_ids = jnp.arange(arch.decoder_layers)
    kv_scales = ((cache.cross_k_scale, cache.cross_v_scale) if quantized
                 else (layer_ids, layer_ids))
    carry0 = (x, cache.self_k, cache.self_v)
    if self_quant:
        carry0 = carry0 + (cache.self_k_scale, cache.self_v_scale)
    final_carry, aligned = jax.lax.scan(
        body, carry0,
        (layer_ids, dec["layers"], cache.cross_k, cache.cross_v,
         kv_scales, sel))
    if self_quant:
        x, new_k, new_v, new_ks, new_vs = final_carry
    else:
        x, new_k, new_v = final_carry

    x = layer_norm(x, dec["ln"])
    logits = jnp.einsum("bsd,vd->bsv", x, dec["tok_emb"].astype(dtype),
                        preferred_element_type=jnp.float32)
    align_probs = jnp.sum(aligned, axis=0).astype(jnp.float32)
    new_cache = cache._replace(self_k=new_k, self_v=new_v)
    if self_quant:
        new_cache = new_cache._replace(self_k_scale=new_ks,
                                       self_v_scale=new_vs)
    return logits, new_cache, align_probs


def decoder_forward(params: Params, arch: WhisperArch,
                    decoder_input_ids: jax.Array,
                    encoder_out: jax.Array) -> jax.Array:
    """Teacher-forced full-sequence decoder: [B, T] ids -> [B, T, vocab].

    Used for parity tests, no-speech capture, and (later) training.
    """
    dec = params["decoder"]
    h = arch.decoder_attention_heads
    t = decoder_input_ids.shape[-1]
    dtype = encoder_out.dtype
    scale = arch.head_dim ** -0.5

    x = dec["tok_emb"][decoder_input_ids].astype(dtype)
    x = x + dec["pos_emb"][:t].astype(dtype)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]

    def body(hidden, lp):
        y = layer_norm(hidden, lp["ln1"])
        q, k, v = _self_qkv(y, lp["self"], h, scale)
        out, _ = attention(q, k, v, causal)
        hidden = hidden + dense(_merge_heads(out), lp["self"]["o"])
        y = layer_norm(hidden, lp["ln2"])
        qc = _split_heads(dense(y, lp["cross"]["q"]) * scale, h)
        kc = _split_heads(dense(encoder_out, lp["cross"]["k"]), h)
        vc = _split_heads(dense(encoder_out, lp["cross"]["v"]), h)
        out, _ = attention(qc, kc, vc)
        hidden = hidden + dense(_merge_heads(out), lp["cross"]["o"])
        hidden = hidden + mlp_block(layer_norm(hidden, lp["ln3"]), lp["mlp"])
        return hidden, None

    x, _ = jax.lax.scan(body, x, dec["layers"])
    x = layer_norm(x, dec["ln"])
    return jnp.einsum("btd,vd->btv", x, dec["tok_emb"].astype(dtype),
                      preferred_element_type=jnp.float32)


def forward(params: Params, arch: WhisperArch, input_features: jax.Array,
            decoder_input_ids: jax.Array) -> jax.Array:
    """Full teacher-forced forward (encoder + decoder) -> logits."""
    return decoder_forward(params, arch, decoder_input_ids,
                           encode(params, arch, input_features))


# ---------------------------------------------------------------------------
# Aux model heads (reference aux classes, modeling_whisper.py:1359/:1500)
# ---------------------------------------------------------------------------


def causal_lm_forward(params: Params, arch: WhisperArch,
                      input_ids: jax.Array,
                      encoder_out: jax.Array | None = None) -> jax.Array:
    """WhisperForCausalLM analog (modeling_whisper.py:1359): the decoder as
    a standalone LM — used as the assistant model in speculative decoding.
    With encoder_out=None the cross-attention sublayer contributes its
    residual with zeroed attention output (no encoder states to attend)."""
    if encoder_out is not None:
        return decoder_forward(params, arch, input_ids, encoder_out)
    dec = params["decoder"]
    h = arch.decoder_attention_heads
    t = input_ids.shape[-1]
    dtype = dec["tok_emb"].dtype
    scale = arch.head_dim ** -0.5

    x = dec["tok_emb"][input_ids].astype(dtype)
    x = x + dec["pos_emb"][:t].astype(dtype)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]

    def body(hidden, lp):
        y = layer_norm(hidden, lp["ln1"])
        q, k, v = _self_qkv(y, lp["self"], h, scale)
        out, _ = attention(q, k, v, causal)
        hidden = hidden + dense(_merge_heads(out), lp["self"]["o"])
        # cross-attention skipped (decoder-only mode)
        hidden = hidden + mlp_block(layer_norm(hidden, lp["ln3"]), lp["mlp"])
        return hidden, None

    x, _ = jax.lax.scan(body, x, dec["layers"])
    x = layer_norm(x, dec["ln"])
    return jnp.einsum("btd,vd->btv", x, dec["tok_emb"].astype(dtype),
                      preferred_element_type=jnp.float32)


def audio_classification_forward(params: Params, arch: WhisperArch,
                                 input_features: jax.Array,
                                 head: Params) -> jax.Array:
    """WhisperForAudioClassification analog (modeling_whisper.py:1500):
    encoder -> projector -> mean-pool over time -> classifier logits.
    `head` = {"projector": {w,b}, "classifier": {w,b}}."""
    states = encode(params, arch, input_features)
    proj = dense(states, head["projector"])          # [B, T, proj]
    pooled = jnp.mean(proj, axis=1)
    return dense(pooled, head["classifier"]).astype(jnp.float32)


def init_classification_head(arch: WhisperArch, num_labels: int,
                             key: jax.Array,
                             classifier_proj_size: int = 256,
                             dtype: jnp.dtype = jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    std = 0.02
    return {
        "projector": {
            "w": jax.random.normal(k1, (arch.d_model, classifier_proj_size),
                                   dtype) * std,
            "b": jnp.zeros((classifier_proj_size,), dtype)},
        "classifier": {
            "w": jax.random.normal(k2, (classifier_proj_size, num_labels),
                                   dtype) * std,
            "b": jnp.zeros((num_labels,), dtype)},
    }


# ---------------------------------------------------------------------------
# Initialization (for tests / from-scratch training)
# ---------------------------------------------------------------------------


def init_params(arch: WhisperArch, key: jax.Array,
                dtype: jnp.dtype = jnp.float32) -> Params:
    """Random init mirroring the reference's init distributions
    (std = config.init_std on dense/conv, sinusoid encoder positions)."""
    std = 0.02
    _counter = iter(range(1_000_000))
    keys = (jax.random.fold_in(key, i) for i in _counter)

    def lin(din, dout, bias=True):
        p = {"w": jax.random.normal(next(keys), (din, dout), dtype) * std}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def ln(d):
        return {"scale": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)}

    d = arch.d_model

    def attn_params(bias_k=False):
        return {"q": lin(d, d), "k": lin(d, d, bias=bias_k), "v": lin(d, d),
                "o": lin(d, d)}

    def enc_layer(_):
        return {"ln1": ln(d), "attn": attn_params(), "ln2": ln(d),
                "mlp": {"fc1": lin(d, arch.encoder_ffn_dim),
                        "fc2": lin(arch.encoder_ffn_dim, d)}}

    def dec_layer(_):
        return {"ln1": ln(d), "self": attn_params(),
                "ln2": ln(d), "cross": attn_params(),
                "ln3": ln(d),
                "mlp": {"fc1": lin(d, arch.decoder_ffn_dim),
                        "fc2": lin(arch.decoder_ffn_dim, d)}}

    def stack(fn, n):
        layers = [fn(i) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    params: Params = {
        "encoder": {
            "conv1": {"w": jax.random.normal(
                next(keys), (3, arch.num_mel_bins, d), dtype) * std,
                "b": jnp.zeros((d,), dtype)},
            "conv2": {"w": jax.random.normal(next(keys), (3, d, d),
                                             dtype) * std,
                      "b": jnp.zeros((d,), dtype)},
            "pos": jnp.asarray(sinusoids(arch.max_source_positions, d),
                               dtype),
            "layers": stack(enc_layer, arch.encoder_layers),
            "ln_post": ln(d),
        },
        "decoder": {
            "tok_emb": jax.random.normal(
                next(keys), (arch.vocab_size, d), dtype) * std,
            "pos_emb": jax.random.normal(
                next(keys), (arch.max_target_positions, d), dtype) * std,
            "layers": stack(dec_layer, arch.decoder_layers),
            "ln": ln(d),
        },
    }
    return params
