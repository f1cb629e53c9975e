"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a virtual device mesh
(SURVEY.md section 4, item 4): 8 CPU devices via XLA_FLAGS, so `Mesh`/
`shard_map`/halo-exchange tests run anywhere. Must be set before JAX import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The machine's sitecustomize registers the TPU-tunnel ("axon") PJRT plugin
# and force-selects it via jax.config, overriding the env var -- undo that so
# tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


CALIB_DIRS = {
    "320x240": "/root/reference/backup/320x240",
    "640x480": "/root/reference/backup/640x480",
    "1280x720": "/root/reference/backup/1280x720",
}


@pytest.fixture(params=list(CALIB_DIRS))
def calib_dir(request):
    import os.path

    path = CALIB_DIRS[request.param]
    if not os.path.isdir(path):
        pytest.skip("reference calibration data not available")
    return path


# Persistent compilation cache for the CPU test backend: the suite is
# compile-dominated (shard_map meshes, Pallas interpret graphs), so warm
# runs drop from ~10min to ~2min. TPU-side persistent caching is NOT safe
# on this machine (it hangs the axon tunnel) -- this applies to the test
# processes only, which force the CPU backend above.
_cache_dir = os.path.join(
    os.path.dirname(__file__), "..", ".pytest_jax_cache"
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
