"""Test config: force an 8-device virtual CPU mesh.

The TPU-analog of the reference's MultiProcessRun one-process-per-GPU test
harness (reference: cpp/src/parallel_utils.cpp:46-90, python
utils/multiprocess.py:29-38): instead of forking per device, we run one
process with 8 XLA host-platform devices and shard over them.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# WGTPU_TEST_TPU=1 keeps the real TPU backend (for tests/test_pallas_tpu.py)
if os.environ.get("WGTPU_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is dominated by shard_map/collective
# compiles, which are identical across runs
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import wholegraph_tpu.parallel as par

    return par.create_global_mesh(jax.devices()[:8])


@pytest.fixture(scope="session")
def mesh4():
    import wholegraph_tpu.parallel as par

    return par.create_global_mesh(jax.devices()[:4])


@pytest.fixture(scope="session")
def hier_mesh():
    """2x4 (node, device) hierarchy mesh on the 8 virtual devices."""
    import wholegraph_tpu.parallel as par

    return par.create_hierarchy_mesh(2, 4, devices=jax.devices()[:8])


def deterministic_rows(n, dim, dtype=np.float32, scale=1.0):
    """Deterministic value-from-index features, the reference test pillar
    (embedding_test_utils.cu): row i, col j = f(i, j)."""
    i = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(dim, dtype=np.float64)[None, :]
    return ((i * 131.0 + j * 7.0 + 1.0) % 997.0 * scale / 997.0).astype(dtype)


@pytest.fixture(scope="session")
def det_rows():
    return deterministic_rows
