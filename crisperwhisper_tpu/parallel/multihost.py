"""Multi-host (DCN) serving: distributed init + hybrid ICI/DCN mesh.

The reference has no distributed machinery at all (SURVEY.md §2.8 —
`grep -ri distributed|nccl|world_size` over the repo matches nothing);
this module is the framework's own scale-out story, closing SURVEY
§2.8's plan line ("multi-host DCN for fleet serving", VERDICT r3
missing-item 5).

Topology recipe (the scaling-book rule: collectives that carry real
traffic ride ICI, not DCN):

  * "model" (tensor parallel)  -> ICI only. TP all-reduces fire every
    layer; they must stay inside one host's slice.
  * "data"  (chunk batches)    -> DCN x remaining ICI. 30 s chunks are
    embarrassingly parallel — the ONLY cross-host traffic is parameter
    broadcast at load time; steady-state serving crosses DCN never.

Single-host callers need none of this: `make_mesh` (mesh.py) already
covers one process. Multi-host flow:

    # on every host (same binary):
    init_multihost(coordinator, num_processes=N, process_id=i)
    mesh = make_serving_mesh(model=4)          # TP within host
    pipe = hub.load_pipeline(ckpt, mesh=mesh)  # params shard over it

Testing without a cluster: `make_serving_mesh` is pure mesh geometry —
the 8-device virtual CPU mesh exercises it (tests/test_parallel.py);
`jax.distributed` wiring is a thin passthrough validated by its own
argument contract.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

_INITIALIZED = False


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   local_device_ids: list[int] | None = None,
                   autodetect: bool = False) -> None:
    """Idempotent `jax.distributed.initialize` wrapper.

    No-ops in a single-process world (all arguments None/absent):
    single-host serving must not require a coordinator. On TPU pods
    with a supported launcher (GKE/Cloud TPU metadata), pass
    `autodetect=True` and jax discovers the coordinator/world itself —
    the flag is required because silent autodetection cannot be
    distinguished from the single-host no-op (an all-None call on a pod
    would otherwise quietly serve N disconnected replicas). Otherwise
    pass the coordinator ("host0:port"), world size, and this host's
    rank explicitly.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if (not autodetect and coordinator_address is None
            and num_processes in (None, 1)):
        return                       # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True


def make_serving_mesh(model: int = 1, data: int | None = None) -> Mesh:
    """("data", "model") mesh over ALL processes' devices with the model
    axis pinned to intra-host ICI.

    model: TP degree — must divide the per-process (= per-ICI-slice)
    device count so a TP group never crosses DCN. data: total
    data-parallel degree (default: every remaining device in the job).
    """
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    n_proc = max(jax.process_count(), 1)
    if model < 1 or n_local % model:
        raise ValueError(
            f"model axis {model} must divide the per-host device count "
            f"{n_local} (TP all-reduces must stay on ICI)")
    data_per_host = n_local // model
    full_data = data_per_host * n_proc
    if data is None:
        data = full_data
    if data != full_data:
        raise ValueError(
            f"data axis {data} must equal per-host data ({data_per_host})"
            f" x processes ({n_proc}) = {full_data}; shrink the job "
            f"instead of idling devices")
    if n_proc > 1:
        # Process-major device layout: each process's local devices form
        # data_per_host contiguous rows, so every model-axis group (one
        # row) lives inside ONE process — TP all-reduces never cross DCN.
        # (mesh_utils.create_hybrid_device_mesh is NOT the tool here: it
        # groups by slice_index and a multi-host pod slice has slice
        # count 1 — it raises "Number of slices 1 must equal ..."; found
        # by the two-process CPU test, tests/test_multihost_dcn.py.)
        devs = sorted(jax.devices(),
                      key=lambda d: (d.process_index, d.id))
        dev = np.array(devs).reshape(data, model)
        for row in dev:
            owners = {d.process_index for d in row}
            assert len(owners) == 1, (
                f"model group spans processes {owners}")
    else:
        dev = mesh_utils.create_device_mesh((data, model))
    assert dev.shape == (data, model), (dev.shape, data, model)
    return Mesh(dev, ("data", "model"))


def process_local_batch(global_batch: int) -> int:
    """The slice of a data-sharded batch this process feeds. Serving
    feeds per-host batches; jax.make_array_from_process_local_data
    assembles the global array."""
    n_proc = max(jax.process_count(), 1)
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} must be a "
                         f"multiple of process count {n_proc}")
    return global_batch // n_proc


def host_local_array(data: np.ndarray, mesh: Mesh) -> jax.Array:
    """Assemble a global data-sharded array from per-process shards —
    the DCN-era replacement for plain device_put of the full batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() <= 1:
        return jax.device_put(data, sharding)
    global_shape = (data.shape[0] * jax.process_count(),) + data.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, data, global_shape)
