"""Checkpoint loading: HF safetensors -> stacked JAX pytrees.

Replaces the reference's `from_pretrained(..., use_safetensors=True,
low_cpu_mem_usage=True)` path (ref:transcribe.py:14-16): tensors are read
per-shard from safetensors, renamed/transposed into our layout, stacked on
the layer axis, and `jax.device_put` with an optional NamedSharding so
large checkpoints land directly in sharded device memory (SURVEY.md §5.4).

Layout conversions (torch -> ours):
  * nn.Linear weight [out, in]       -> [in, out]
  * nn.Conv1d weight [out, in, k]    -> [k, in, out]
  * per-layer tensors                -> stacked [L, ...] for lax.scan
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperArch
from .whisper import Params

_ATTN_MAP = {"q_proj": "q", "k_proj": "k", "v_proj": "v", "out_proj": "o"}


def _set(tree: dict, path: tuple, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_key(key: str) -> tuple[tuple, Callable[[np.ndarray], np.ndarray],
                                    int | None] | None:
    """Map an HF state-dict key to (our path, transform, layer index).

    layer index is None for non-stacked tensors; returns None for keys we
    deliberately ignore (e.g. the tied proj_out.weight duplicate).
    """
    key = re.sub(r"^model\.", "", key)
    t_lin = lambda x: np.ascontiguousarray(x.T)
    t_conv = lambda x: np.ascontiguousarray(np.transpose(x, (2, 1, 0)))
    ident = lambda x: x

    if key == "proj_out.weight":      # tied to decoder.embed_tokens
        return None
    m = re.match(r"(encoder|decoder)\.layers\.(\d+)\.(.+)", key)
    if m:
        stack, idx, rest = m.group(1), int(m.group(2)), m.group(3)
        wb = "w" if rest.endswith("weight") else "b"
        tf = t_lin if wb == "w" else ident
        if stack == "encoder":
            for hf, ours in (("self_attn_layer_norm", "ln1"),
                             ("final_layer_norm", "ln2")):
                if rest.startswith(hf):
                    return (("encoder", "layers", "ln",
                             (ours, "scale" if wb == "w" else "bias")),
                            ident, idx)
            m2 = re.match(r"self_attn\.(\w+)\.(weight|bias)", rest)
            if m2:
                return (("encoder", "layers", "attn",
                         (_ATTN_MAP[m2.group(1)], wb)), tf, idx)
            m2 = re.match(r"(fc1|fc2)\.(weight|bias)", rest)
            if m2:
                return (("encoder", "layers", "mlp", (m2.group(1), wb)),
                        tf, idx)
        else:
            for hf, ours in (("self_attn_layer_norm", "ln1"),
                             ("encoder_attn_layer_norm", "ln2"),
                             ("final_layer_norm", "ln3")):
                if rest.startswith(hf):
                    return (("decoder", "layers", "ln",
                             (ours, "scale" if wb == "w" else "bias")),
                            ident, idx)
            m2 = re.match(r"self_attn\.(\w+)\.(weight|bias)", rest)
            if m2:
                return (("decoder", "layers", "self",
                         (_ATTN_MAP[m2.group(1)], wb)), tf, idx)
            m2 = re.match(r"encoder_attn\.(\w+)\.(weight|bias)", rest)
            if m2:
                return (("decoder", "layers", "cross",
                         (_ATTN_MAP[m2.group(1)], wb)), tf, idx)
            m2 = re.match(r"(fc1|fc2)\.(weight|bias)", rest)
            if m2:
                return (("decoder", "layers", "mlp", (m2.group(1), wb)),
                        tf, idx)
        raise KeyError(f"unrecognized layer tensor: {key}")

    flat = {
        "encoder.conv1.weight": (("encoder", "conv1", "w"), t_conv),
        "encoder.conv1.bias": (("encoder", "conv1", "b"), ident),
        "encoder.conv2.weight": (("encoder", "conv2", "w"), t_conv),
        "encoder.conv2.bias": (("encoder", "conv2", "b"), ident),
        "encoder.embed_positions.weight": (("encoder", "pos"), ident),
        "encoder.layer_norm.weight": (("encoder", "ln_post", "scale"), ident),
        "encoder.layer_norm.bias": (("encoder", "ln_post", "bias"), ident),
        "decoder.embed_tokens.weight": (("decoder", "tok_emb"), ident),
        "decoder.embed_positions.weight": (("decoder", "pos_emb"), ident),
        "decoder.layer_norm.weight": (("decoder", "ln", "scale"), ident),
        "decoder.layer_norm.bias": (("decoder", "ln", "bias"), ident),
    }
    if key in flat:
        path, tf = flat[key]
        return path, tf, None
    raise KeyError(f"unrecognized checkpoint tensor: {key}")


def params_from_state_dict(state: Mapping[str, np.ndarray], arch: WhisperArch,
                           dtype: jnp.dtype = jnp.float32,
                           as_numpy: bool = False) -> Params:
    """Convert a flat HF-style state dict of numpy arrays to our pytree.

    as_numpy=True keeps leaves as host numpy arrays (low-memory sharded
    loading: the caller device_puts straight onto shardings)."""
    tree: dict = {}
    # staging: per-layer tensors collected then stacked
    staged: dict[tuple, dict[int, np.ndarray]] = {}
    for key, value in state.items():
        conv = _convert_key(key)
        if conv is None:
            continue
        path, tf, idx = conv
        arr = tf(np.asarray(value))
        if idx is None:
            _set(tree, path, arr)
        else:
            staged.setdefault(path, {})[idx] = arr

    for path, by_layer in staged.items():
        n = {"encoder": arch.encoder_layers,
             "decoder": arch.decoder_layers}[path[0]]
        missing = set(range(n)) - set(by_layer)
        if missing:
            raise ValueError(f"missing layers {sorted(missing)} for {path}")
        stacked = np.stack([by_layer[i] for i in range(n)])
        # path layout: (stack, "layers", group, (leaf... )) ; ln group keeps
        # its sub-path inside the tuple tail.
        stack_name, _, group, leaf = path
        if group == "ln":
            _set(tree, (stack_name, "layers", leaf[0], leaf[1]), stacked)
        else:
            _set(tree, (stack_name, "layers", group, leaf[0], leaf[1]),
                 stacked)

    # LN scale/bias stay f32 (layer_norm computes in f32; bf16-rounding the
    # affine params shifts logits enough to perturb DTW jump indices —
    # SURVEY.md §7 hard part (e)). Everything else casts to `dtype`.
    _F32_KEYS = {"ln", "ln1", "ln2", "ln3", "ln_post"}

    def cast_tree(node, keep_f32=False):
        if isinstance(node, dict):
            return {k: cast_tree(v, keep_f32 or k in _F32_KEYS)
                    for k, v in node.items()}
        if as_numpy:
            # host-side cast (ml_dtypes handles bf16 numpy arrays) so the
            # caller can device_put each leaf DIRECTLY onto its sharding
            # without first materializing the model on one device
            a = np.asarray(node)
            if keep_f32 or a.dtype != np.float32:
                return a
            return a.astype(np.dtype(dtype))
        a = jnp.asarray(node)
        if keep_f32 or a.dtype != jnp.float32:
            return a
        return a.astype(dtype)

    return cast_tree(tree)


def classification_head_from_state_dict(state: Mapping[str, np.ndarray],
                                        dtype: jnp.dtype = jnp.float32
                                        ) -> Params:
    """WhisperForAudioClassification head tensors -> the head pytree for
    `audio_classification_forward` (ref: hf modeling_whisper.py:1500).
    Converts the torch nn.Linear [out, in] layout of `projector.*` /
    `classifier.*` to our [in, out] {w, b} entries."""
    def lin(prefix: str) -> Params:
        w = np.asarray(state[f"{prefix}.weight"])
        p: Params = {"w": jnp.asarray(np.ascontiguousarray(w.T), dtype)}
        if f"{prefix}.bias" in state:
            p["b"] = jnp.asarray(np.asarray(state[f"{prefix}.bias"]), dtype)
        return p

    return {"projector": lin("projector"), "classifier": lin("classifier")}


def _iter_safetensor_files(model_dir: str) -> Iterable[str]:
    index = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for fname in sorted(set(weight_map.values())):
            yield os.path.join(model_dir, fname)
    else:
        single = os.path.join(model_dir, "model.safetensors")
        if not os.path.exists(single):
            raise FileNotFoundError(f"no safetensors in {model_dir}")
        yield single


def load_params(model_dir: str, arch: WhisperArch | None = None,
                dtype: jnp.dtype = jnp.bfloat16,
                sharding: Any | None = None,
                mesh: Any | None = None) -> tuple[Params, WhisperArch]:
    """Load a local HF-format Whisper checkpoint directory.

    Returns (params, arch). When ``sharding`` is a pytree of NamedShardings
    (or a single sharding), params are device_put accordingly. When
    ``mesh`` is a ("data", "model") Mesh, params are cast on HOST and
    device_put leaf-by-leaf straight onto their tensor-parallel specs
    (parallel/mesh.param_pspecs) — the model never materializes whole on
    a single device.
    """
    from safetensors import safe_open

    if arch is None:
        with open(os.path.join(model_dir, "config.json")) as f:
            arch = WhisperArch.from_hf_config(json.load(f))

    state: dict[str, np.ndarray] = {}
    for path in _iter_safetensor_files(model_dir):
        with safe_open(path, framework="numpy") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    if mesh is not None:
        from ..parallel import shard_params
        params = params_from_state_dict(state, arch, dtype, as_numpy=True)
        params = shard_params(params, mesh)
        return params, arch
    params = params_from_state_dict(state, arch, dtype)
    if sharding is not None:
        params = jax.device_put(params, sharding)
    return params, arch


def state_dict_from_params(params: Params) -> dict[str, np.ndarray]:
    """Inverse of params_from_state_dict: our stacked pytree -> a flat
    HF-format state dict (torch tensor layouts, "model."-prefixed keys).

    Enables HF-format checkpoint EXPORT (save_hf_checkpoint) so models
    trained/fine-tuned here round-trip into the reference stack
    (from_pretrained, ref:transcribe.py:12). Quantized trees must be
    dequantized first (raises on w_q/w_q4 leaves — export the bf16/f32
    source params instead)."""
    t_lin = lambda x: np.ascontiguousarray(np.asarray(x).T)
    t_conv = lambda x: np.ascontiguousarray(
        np.transpose(np.asarray(x), (2, 1, 0)))
    host = lambda x: np.ascontiguousarray(np.asarray(x))
    out: dict[str, np.ndarray] = {}

    def emit_lin(prefix: str, p: Mapping[str, Any],
                 layer: int | None = None) -> None:
        if "w_q" in p or "w_q4" in p:
            raise ValueError(f"{prefix}: quantized leaf cannot be exported "
                             "to HF format; export the unquantized params")
        sel = (lambda a: np.asarray(a)[layer]) if layer is not None \
            else np.asarray
        out[f"{prefix}.weight"] = t_lin(sel(p["w"]))
        if "b" in p:
            out[f"{prefix}.bias"] = host(sel(p["b"]))

    def emit_ln(prefix: str, p: Mapping[str, Any],
                layer: int | None = None) -> None:
        sel = (lambda a: np.asarray(a)[layer]) if layer is not None \
            else np.asarray
        out[f"{prefix}.weight"] = host(sel(p["scale"]))
        out[f"{prefix}.bias"] = host(sel(p["bias"]))

    enc, dec = params["encoder"], params["decoder"]
    for name, conv in (("conv1", enc["conv1"]), ("conv2", enc["conv2"])):
        out[f"model.encoder.{name}.weight"] = t_conv(conv["w"])
        out[f"model.encoder.{name}.bias"] = host(conv["b"])
    out["model.encoder.embed_positions.weight"] = host(enc["pos"])
    emit_ln("model.encoder.layer_norm", enc["ln_post"])
    out["model.decoder.embed_tokens.weight"] = host(dec["tok_emb"])
    out["model.decoder.embed_positions.weight"] = host(dec["pos_emb"])
    emit_ln("model.decoder.layer_norm", dec["ln"])

    n_enc = np.asarray(enc["layers"]["ln1"]["scale"]).shape[0]
    for i in range(n_enc):
        base = f"model.encoder.layers.{i}"
        emit_ln(f"{base}.self_attn_layer_norm", enc["layers"]["ln1"], i)
        emit_ln(f"{base}.final_layer_norm", enc["layers"]["ln2"], i)
        for hf, ours in _ATTN_MAP.items():
            emit_lin(f"{base}.self_attn.{hf}",
                     enc["layers"]["attn"][ours], i)
        emit_lin(f"{base}.fc1", enc["layers"]["mlp"]["fc1"], i)
        emit_lin(f"{base}.fc2", enc["layers"]["mlp"]["fc2"], i)

    n_dec = np.asarray(dec["layers"]["ln1"]["scale"]).shape[0]
    for i in range(n_dec):
        base = f"model.decoder.layers.{i}"
        emit_ln(f"{base}.self_attn_layer_norm", dec["layers"]["ln1"], i)
        emit_ln(f"{base}.encoder_attn_layer_norm", dec["layers"]["ln2"], i)
        emit_ln(f"{base}.final_layer_norm", dec["layers"]["ln3"], i)
        for hf, ours in _ATTN_MAP.items():
            emit_lin(f"{base}.self_attn.{hf}", dec["layers"]["self"][ours],
                     i)
            emit_lin(f"{base}.encoder_attn.{hf}",
                     dec["layers"]["cross"][ours], i)
        emit_lin(f"{base}.fc1", dec["layers"]["mlp"]["fc1"], i)
        emit_lin(f"{base}.fc2", dec["layers"]["mlp"]["fc2"], i)
    return out


def save_hf_checkpoint(model_dir: str, params: Params, arch: WhisperArch,
                       config_extra: Mapping[str, Any] | None = None
                       ) -> None:
    """Write an HF-format checkpoint directory (model.safetensors +
    config.json) loadable by both load_params and the reference's
    from_pretrained. Tokenizer/generation files are the caller's concern
    (they are data, not weights)."""
    from safetensors.numpy import save_file

    os.makedirs(model_dir, exist_ok=True)
    state = state_dict_from_params(params)
    # bf16 numpy arrays (ml_dtypes) round-trip through safetensors
    # natively (verified against the installed safetensors)
    save_file(state, os.path.join(model_dir, "model.safetensors"))
    cfg = arch.to_hf_config() if hasattr(arch, "to_hf_config") else {}
    cfg = {**cfg, **(dict(config_extra) if config_extra else {})}
    cfg.setdefault("model_type", "whisper")
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
