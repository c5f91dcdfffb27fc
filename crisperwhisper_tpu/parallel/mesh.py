"""Device mesh and sharding rules.

The reference has NO multi-device machinery (SURVEY.md §2.8 — single
process, single device, batch-of-chunks only). Here scaling is
first-class: a ("data", "model") mesh where the chunk batch is sharded
over "data" (each 30 s window is independent — embarrassingly parallel)
and attention heads / MLP hidden of the transformer are tensor-sharded
over "model" for low-latency large-v3 serving. XLA inserts the
all-reduces (psum over ICI) from the shardings; there is no hand-written
collective here.

Sharding layout (per stacked [L, ...] param):
  attn q/k/v:  w [L, d, d]   -> (None, None, "model")   heads split
               b [L, d]      -> (None, "model")
  attn out:    w [L, d, d]   -> (None, "model", None)   row-parallel
  mlp fc1:     w [L, d, f]   -> (None, None, "model")
  mlp fc2:     w [L, f, d]   -> (None, "model", None)
  everything else (LN, conv stem, embeddings): replicated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if n > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def _col_parallel(leaf: str) -> P | None:
    """Specs for a COLUMN-parallel dense (outputs split over "model"),
    covering the plain, int8 and grouped-int4 weight layouts
    (models/quantize.py): w [L,di,do], w_q [L,di,do], w_scale [L,1,do],
    w_q4 [L,G,gsz/2,do] (nibble-packed uint8), w_gscale [L,G,do],
    b [L,do]."""
    return {
        "w": P(None, None, "model"),
        "w_q": P(None, None, "model"),
        "w_scale": P(None, None, "model"),
        "w_q4": P(None, None, None, "model"),
        "w_gscale": P(None, None, "model"),
        "b": P(None, "model"),
    }.get(leaf)


def _row_parallel(leaf: str) -> P | None:
    """Specs for a ROW-parallel dense (inputs split over "model"; outputs
    replicated after the psum XLA inserts). Per-output int8 scales and
    biases apply after the sum -> replicated; grouped-int4 scales follow
    the split input-group axis."""
    return {
        "w": P(None, "model", None),
        "w_q": P(None, "model", None),
        "w_scale": P(),
        "w_q4": P(None, "model", None, None),
        "w_gscale": P(None, "model", None),
        "b": P(),
    }.get(leaf)


def _param_spec(path: tuple[str, ...], ndim: int) -> P:
    """Partition spec for one parameter identified by its tree path."""
    path_s = "/".join(str(p) for p in path)
    leaf = path[-1]
    # attention projections (encoder attn / decoder self / decoder cross)
    for group in ("attn", "self", "cross"):
        if f"/{group}/" in f"/{path_s}/":
            if "/qkv/" in f"/{path_s}/":
                # FUSED qkv ([di, 3d] with q|k|v column blocks): a plain
                # "model" column split would cut across the q/k/v block
                # boundaries — replicate instead. hub.load_pipeline skips
                # the fusion when a mesh is given so TP applies cleanly.
                return P()
            if len(path) >= 2 and path[-2] == "o":
                return _row_parallel(leaf) or P()
            return _col_parallel(leaf) or P()
    if "/mlp/" in f"/{path_s}/":
        if len(path) >= 2 and path[-2] == "fc1":
            return _col_parallel(leaf) or P()
        if len(path) >= 2 and path[-2] == "fc2":
            return _row_parallel(leaf) or P()
        return P()
    return P()                                   # LN, conv, embeddings


def param_pspecs(params: Any) -> Any:
    """Pytree of PartitionSpecs matching the param pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    paths = [tuple(getattr(k, "key", str(k)) for k in path)
             for path, _ in flat[0]]
    specs = [_param_spec(p, np.ndim(v)) for p, (_, v) in zip(paths, flat[0])]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put params with TP shardings over `mesh`."""
    specs = param_pspecs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    return jax.device_put(params, shardings)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs (chunks over the data axis)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
