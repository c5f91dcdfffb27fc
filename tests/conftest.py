"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set platform flags before jax initializes (SURVEY.md §4.3: the TPU
answer to "test multi-node without a cluster").
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
for p in (os.path.dirname(_HERE), _HERE):   # repo root + tests/ (helpers)
    if p not in sys.path:
        sys.path.insert(0, p)

os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and rewrites
# jax_platforms; post-import config updates win. 8 virtual CPU devices give
# deterministic numerics and a mesh for pjit tests.
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Golden parity vs torch-f32 requires true f32 matmuls; JAX's default
# precision truncates matmul inputs to bf16 even on CPU.
jax.config.update("jax_default_matmul_precision", "float32")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of large CPU programs in one process
    (seek loops, beam loops, interpret-mode Pallas kernels); with all of
    them held live, the XLA CPU compiler was observed to segfault
    non-deterministically in LATE modules (backend_compile in
    test_pipeline / test_parallel after ~170 tests — two captured
    faulthandler dumps, different tests each time, no other Python
    threads alive). Releasing the accumulated executables between
    modules keeps the compiler healthy; module-scoped fixtures recompile
    what they still need."""
    yield
    jax.clear_caches()
