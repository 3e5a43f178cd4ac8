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

# HISTORY (round 2-3 workaround, removed round 4): an every-25-tests
# jax.clear_caches() fixture papered over a deterministic XLA:CPU
# backend_compile SEGFAULT when 140+ distinct programs accumulated in
# one process (crashed at test #131 on the round-2 host). Re-checked on
# jax 0.9.0 / the current host: the FULL fast tier passes single-process
# with the flush disabled (140 passed, 0:06:43), so the workaround is
# gone. If a later jax/host combination resurrects the crash, restore
# the fixture from git history (commit 989471b's tests/conftest.py).
