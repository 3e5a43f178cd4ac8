"""Persistent XLA compilation cache wiring.

Every framework entry point (CLI, bench.py, render server, the test
conftest) enables jax's on-disk compilation cache for CPU runs: repeat
test/dev invocations skip recompiles entirely (measured: the
render_wavefront executables appear in the cache and second processes
start in seconds).

The remote-TPU (axon tunnel) backend is measured NOT to benefit: no
executable is ever written for it (the PjRt client does not serialize),
so a second bench.py still pays the full 20-300 s+ remote compile. The
cache is therefore gated off for non-CPU platforms -- on the tunnel, use
the persistent render server (`serve` subcommand) whose in-process
executable cache makes repeat configurations free. Set
RTW_JAX_CACHE_DIR=off to disable, or to a directory to force-enable.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT = "~/.cache/raytracinginoneweekend_tpu/xla"


def _host_cpu_tag() -> str:
    """Hash of the host CPU feature set.

    XLA:CPU caches AOT executables compiled FOR THE CACHING MACHINE'S
    feature set; loading one on a host with different features is
    documented to 'lead to execution errors such as SIGILL' -- and was
    observed to SEGFAULT the test suite when the environment moved to a
    different box. Scoping the cache directory by the cpuinfo flags line
    makes cross-machine reuse structurally impossible.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable the cache (idempotent); returns the directory or None."""
    import jax

    forced = path or os.environ.get("RTW_JAX_CACHE_DIR")
    path = forced or _DEFAULT
    if path.lower() in ("0", "off", "disable", "none"):
        return None
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if not forced and platforms and "cpu" not in platforms:
        return None  # remote backends never hit it (see module docstring)
    if not forced:
        path = os.path.join(path, _host_cpu_tag())
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: tiny entries and fast compiles included (the
    # remote-compile round trip dominates even for small programs).
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
