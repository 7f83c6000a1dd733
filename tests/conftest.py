"""Test configuration: force a clean CPU backend with 8 virtual devices.

Two environment hazards are handled here:

1. The ambient environment pins JAX_PLATFORMS to the TPU platform; the test
   suite must run on a virtual 8-device CPU mesh (the TPU analog of a fake
   cluster). Real-TPU benchmarking lives in bench.py, not the tests.
2. A sitecustomize on PYTHONPATH registers the TPU PJRT plugin and installs
   jax hooks at interpreter startup (gated on PALLAS_AXON_POOL_IPS). Those
   hooks intermittently block even CPU-only array transfers. Since the hook
   runs before conftest, we re-exec once with the registration disabled.
"""

import os
import sys
if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("_SLAM_TESTS_REEXEC") != "1":
    env = dict(os.environ)
    env["_SLAM_TESTS_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable TPU plugin sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo importable regardless of invocation directory.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import numpy as np
import pytest

# The full suite compiles hundreds of XLA CPU executables; each one holds
# LLVM JIT code/data mmaps for the life of the process. Past ~85 tests the
# process exceeds vm.max_map_count (default 65530) and LLVM's memory
# manager fails with "Cannot allocate memory" -> segfault, killing the run
# even with >100 GB of RAM free. Two mitigations: raise the limit when
# permitted (best-effort; needs root), and drop compiled-executable
# references between test modules so their mappings are returned.
try:
    with open("/proc/sys/vm/max_map_count") as f:
        _cur = int(f.read())
    if _cur < 1_000_000:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("1000000")
except OSError:
    pass


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
