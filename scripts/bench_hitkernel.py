#!/usr/bin/env python
"""A/B the closest-hit kernel layouts on real TPU.

Arms: "sublane" (rays on (rows,128) planes, per-sphere SMEM loop) vs
"mxu" (sphere-minor: rays on sublanes, spheres on lanes, the two
per-candidate dot products as (RB,8)@(8,SP) MXU matmuls -- see
ops/pallas_segment.segment_closest_hit_mxu).

Two measurements, one JSON line:
  * kernel-only: the raw closest-hit call on a 32k-lane pool of
    persisted random rays (bounce-like distribution), min of ITERS.
  * frame: the full headline wavefront render with each hit_kernel.

Usage: python scripts/bench_hitkernel.py [--small] [--kernel-only]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import jax
except ModuleNotFoundError:  # pragma: no cover
    _venv = "/opt/venv/bin/python"
    if os.path.exists(_venv) and os.environ.get("RTW_BENCH_REEXEC") != "1":
        os.environ["RTW_BENCH_REEXEC"] = "1"
        os.execv(_venv, [_venv] + sys.argv)
    raise

import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.config import DEFAULT, RenderConfig
from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.ops.pallas_segment import (
    segment_closest_hit, segment_closest_hit_mxu, sphere_params_from_scene)
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.render import render_rays_count
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn


def _kernel_only(scene, pool_rows=256, iters=200):
    sp = sphere_params_from_scene(scene)
    cx, cy, cz, r = sp[:4]
    key = jax.random.key(1)
    ks = jax.random.split(key, 6)
    shape = (pool_rows, 128)
    ox = jax.random.uniform(ks[0], shape, minval=-12, maxval=12)
    oy = jax.random.uniform(ks[1], shape, minval=0.05, maxval=3)
    oz = jax.random.uniform(ks[2], shape, minval=-12, maxval=12)
    dx = jax.random.normal(ks[3], shape)
    dy = jax.random.normal(ks[4], shape)
    dz = jax.random.normal(ks[5], shape)
    rays = tuple(jax.device_put(a) for a in (ox, oy, oz, dx, dy, dz))

    def loop(fn):
        @jax.jit
        def run(rays):
            def body(i, carry):
                h, t, s = fn(rays)
                # fold outputs so the loop isn't dead-code-eliminated
                return (carry[0] + jnp.sum(t * (t < 1e29)),
                        carry[1] ^ jnp.sum(s))
            return jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0), jnp.int32(0)))
        return run

    out = {}
    lane_slots = pool_rows * 128 * iters
    for name, fn in (
            ("sublane", lambda rays: segment_closest_hit(
                rays, cx, cy, cz, r, 0.008, rows=64)),
            ("mxu", lambda rays: segment_closest_hit_mxu(
                rays, cx, cy, cz, r, 0.008, rb=256))):
        run = loop(fn)
        r0 = run(rays)
        jax.block_until_ready(r0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(rays))
            best = min(best, time.perf_counter() - t0)
        out[name] = {"ns_per_lane_slot": best / lane_slots * 1e9,
                     "seconds": best}
    out["speedup"] = (out["sublane"]["ns_per_lane_slot"]
                      / out["mxu"]["ns_per_lane_slot"])
    return out


def main() -> None:
    enable_persistent_cache()
    small = "--small" in sys.argv
    scene = huge_scene(seed=0)
    result = {"kernel_only": _kernel_only(
        scene, iters=20 if small else 200)}

    if "--kernel-only" not in sys.argv:
        if small:
            cfg = RenderConfig(width=240, height=160, spp=8, max_depth=12,
                               camera_mode="thinlens", options=DEFAULT)
        else:
            cfg = RenderConfig(width=1200, height=800, spp=100,
                               max_depth=50, camera_mode="thinlens",
                               options=DEFAULT)
        cam = reference_cpu_camera(cfg.width, cfg.height)
        key = jax.random.key(0)
        rays = render_rays_count(cfg)
        arms = {}
        for name in ("sublane", "mxu"):
            opts = dataclasses.replace(cfg.options, hit_kernel=name)

            def run(opts=opts):
                return render_wavefront(
                    scene, cam, key, width=cfg.width, height=cfg.height,
                    spp=cfg.spp, max_depth=cfg.max_depth,
                    camera_mode=cfg.camera_mode, options=opts)

            seconds, fb = time_fn(run, warmup=1, iters=3)
            arms[name] = {"rays_per_s": rays / seconds,
                          "seconds_per_frame": seconds,
                          "mean": float(np.asarray(fb).mean())}
        arms["speedup"] = (arms["mxu"]["rays_per_s"]
                           / arms["sublane"]["rays_per_s"])
        arms["mean_rel_err"] = abs(
            arms["mxu"]["mean"] - arms["sublane"]["mean"]) / max(
            arms["sublane"]["mean"], 1e-12)
        result["frame"] = arms

    print(json.dumps(result))


if __name__ == "__main__":
    main()
