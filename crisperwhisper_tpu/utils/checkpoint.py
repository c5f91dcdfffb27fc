"""Framework-native checkpointing (orbax).

The HF-format path (models/loader.py) converts safetensors + renames +
stacks layers on every load. For serving fleets this converts once and
caches the ready pytree — including quantized/fused serving variants — as
an orbax checkpoint that restores directly to (sharded) device arrays.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax


def save_params(path: str, params: Any,
                metadata: dict | None = None) -> None:
    """Save a param pytree (any mix of dtypes incl. int8) to `path`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f)


def load_saved_params(path: str, sharding: Any | None = None
                      ) -> tuple[Any, dict]:
    """Restore a pytree saved by save_params; returns (params, metadata).
    With `sharding` (a pytree or single NamedSharding) arrays restore
    directly into the sharded layout."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    item = ckptr.restore(os.path.join(path, "params"))
    if sharding is not None:
        item = jax.device_put(item, sharding)
    meta_path = os.path.join(path, "metadata.json")
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return item, metadata
