"""Test harness: run everything on a virtual 8-device CPU mesh.

Must run before jax is imported anywhere (SURVEY section 4: multi-host
behavior is validated with --xla_force_host_platform_device_count, no real
pod needed).
"""

import os

# Force CPU: the ambient environment may point JAX at real TPU hardware
# (e.g. a tunneled chip), which would make every tiny test op cross the
# tunnel. Tests always run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon tunnel's sitecustomize (active when PALLAS_AXON_POOL_IPS is
# set, i.e. under bare `pytest` without run_tests.sh) registers its PJRT
# plugin AND sets jax_platforms="axon,cpu" at the CONFIG level, which
# overrides the env var above -- tests would then run on the real chip
# and the engines' interpret-mode heuristics flip. Forcing the config
# back makes every pytest entry point hermetic (run_tests.sh remains the
# convenient wrapper).
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: repeat test runs skip recompiles (the
# suite is compile-dominated). RTW_JAX_CACHE_DIR=off disables.
from raytracinginoneweekend_tpu.utils.compilecache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import pytest  # noqa: E402

_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_executable_flush():
    """Clear jax's in-process executable caches every 25 tests.

    The full suite compiles 140+ distinct XLA:CPU programs into one
    process; on some hosts the accumulated JIT state deterministically
    SEGFAULTS a later backend_compile (observed at test #131 with and
    without the on-disk cache, while the same test passes in isolation
    or any smaller prefix). Periodically dropping the executables bounds
    that accumulation; the persistent on-disk cache keeps the re-loads
    cheap.
    """
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % 25 == 0:
        jax.clear_caches()
