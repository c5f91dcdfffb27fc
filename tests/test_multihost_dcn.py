"""Two-process DCN serving test — real `jax.distributed` federation.

SURVEY.md §2.8's multi-host plan line, exercised without a cluster: two
OS processes federate over a localhost coordinator (gloo CPU
collectives), build the hybrid serving mesh, assemble a data-sharded
global batch from per-process shards, and run a TP-sharded encoder
forward whose replicated output must match the unsharded single-process
computation. This is the test tier above tests/test_parallel.py's
single-process mesh geometry (the reference has no distributed
machinery at all — SURVEY §2.8).

Found-by-this-test regression: make_serving_mesh originally used
mesh_utils.create_hybrid_device_mesh, which groups by slice_index and
rejects the (slice count 1) multi-host world this models.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r'''
import sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
import jax
# post-import config updates beat the axon plugin's platform rewrite
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_default_matmul_precision", "float32")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, sys.argv[4])
from crisperwhisper_tpu.config import WhisperArch
from crisperwhisper_tpu.models import encode, init_params
from crisperwhisper_tpu.parallel import (host_local_array, init_multihost,
                                         make_serving_mesh,
                                         process_local_batch)
from crisperwhisper_tpu.parallel.mesh import shard_params

assert jax.process_count() == nproc and jax.device_count() == 2 * nproc

mesh = make_serving_mesh(model=2)
assert dict(mesh.shape) == {"data": nproc, "model": 2}
# TP groups must not cross DCN: every model-axis row in one process
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, row

# cross-process data assembly + collective
local = process_local_batch(2 * nproc) // 1
x = np.full((process_local_batch(2 * nproc), 8), pid + 1, np.float32)
gx = host_local_array(x, mesh)
total = jax.jit(lambda a: a.sum(),
                out_shardings=NamedSharding(mesh, P()))(gx)
expect = 2 * 8 * sum(range(1, nproc + 1))   # 2 rows x 8 cols per process
assert float(total) == expect, (float(total), expect)
print(f"[{pid}] collective OK", flush=True)

# TP-sharded encoder forward == unsharded single-process computation
arch = WhisperArch.tiny()
params = init_params(arch, jax.random.PRNGKey(0))   # same seed everywhere
rng = np.random.default_rng(7)
feats_global = rng.standard_normal(
    (2 * nproc, arch.num_mel_bins, 2 * arch.max_source_positions)
).astype(np.float32)
golden = np.asarray(encode(params, arch, jnp.asarray(feats_global)))

sharded = shard_params(params, mesh)
my_rows = feats_global[2 * pid: 2 * pid + 2]
gfeat = host_local_array(my_rows, mesh)
out = jax.jit(lambda p, f: encode(p, arch, f),
              out_shardings=NamedSharding(mesh, P()))(sharded, gfeat)
np.testing.assert_allclose(np.asarray(out), golden, atol=2e-5, rtol=2e-5)
print(f"[{pid}] tp-forward OK", flush=True)
'''


@pytest.mark.parametrize("nproc", [2])
def test_two_process_dcn_serving(tmp_path, nproc):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(nproc), str(port), _REPO],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"[{i}] collective OK" in out, out
        assert f"[{i}] tp-forward OK" in out, out
