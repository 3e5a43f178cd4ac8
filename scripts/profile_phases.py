#!/usr/bin/env python
"""Per-phase device-time profile of the headline wavefront iteration.

The headline frame (huge scene 1200x800 @ 100spp d50, 32k-lane pool) is a
while_loop of identical iterations: closest-hit Pallas kernel -> XLA
one-hot MXU resolve -> fused shade/regen Pallas kernel (+ ledger flush
once per 32 iterations). This script times each phase STANDALONE at the
exact pool shape, chained through a fori_loop so the ~35ms tunnel
dispatch amortizes away, and compares against the measured whole-frame
per-iteration cost.

Prints one JSON line. Artifact for VERDICT r2 item 1 (per-phase profile).
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.ops.pallas_segment import (
    closest_hit_planar, resolve_params, sphere_params_from_scene)
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn

R_ROWS = 256   # 32k-lane pool
LANES = 128
ROWS = 64      # kernel block rows (ops/wavefront.ROWS_DEFAULT)
REPS = 1000


def make_rays(key):
    ks = jax.random.split(key, 6)
    shape = (R_ROWS, LANES)
    ox = jax.random.uniform(ks[0], shape, minval=-12.0, maxval=12.0)
    oy = jax.random.uniform(ks[1], shape, minval=0.05, maxval=2.0)
    oz = jax.random.uniform(ks[2], shape, minval=-12.0, maxval=12.0)
    dx = jax.random.normal(ks[3], shape)
    dy = jax.random.normal(ks[4], shape)
    dz = jax.random.normal(ks[5], shape)
    return ox, oy, oz, dx, dy, dz


def main() -> None:
    enable_persistent_cache()
    scene = huge_scene(seed=0)
    sp = sphere_params_from_scene(scene)
    cx, cy, cz, r = sp[:4]
    rays = make_rays(jax.random.key(0))
    kernel = sys.argv[sys.argv.index("--kernel") + 1] \
        if "--kernel" in sys.argv else "sublane"

    @functools.partial(jax.jit, static_argnames=("with_resolve", "reps"))
    def loop_hit(rays, cx, cy, cz, r, sp, with_resolve=False, reps=REPS):
        def body(i, rays):
            ox, oy, oz, dx, dy, dz = rays
            hit_i, t_b, s_b = closest_hit_planar(
                (ox, oy, oz, dx, dy, dz), cx, cy, cz, r, DEFAULT.t_min,
                rows=ROWS, kernel=kernel)
            if with_resolve:
                params = resolve_params(s_b, sp)
                feed = params[0] * 0.0 + t_b * 0.0
            else:
                feed = t_b * 0.0 + s_b.astype(jnp.float32) * 0.0
            # Chain a zero-valued dependency so iterations serialize and
            # nothing is DCE'd; ray values stay bit-identical.
            return (ox + feed, oy, oz, dx, dy, dz)

        return jax.lax.fori_loop(0, reps, body, rays)

    def two_point(with_resolve):
        # Per-iteration time from t(2R) - t(R): the constant per-call
        # dispatch overhead (~35 ms through the axon tunnel) cancels.
        t1, _ = time_fn(lambda: loop_hit(rays, cx, cy, cz, r, sp,
                                         with_resolve=with_resolve,
                                         reps=REPS), warmup=1, iters=3)
        t2, _ = time_fn(lambda: loop_hit(rays, cx, cy, cz, r, sp,
                                         with_resolve=with_resolve,
                                         reps=2 * REPS), warmup=1, iters=3)
        return (t2 - t1) / REPS

    t_hit = two_point(False)
    t_hit_res = two_point(True)

    # Whole-frame reference: per-iteration cost of the real engine.
    cfg = dict(width=1200, height=800, spp=100, max_depth=50,
               camera_mode="thinlens", options=DEFAULT)
    cam = reference_cpu_camera(cfg["width"], cfg["height"])
    key = jax.random.key(0)

    def frame():
        return render_wavefront(scene, cam, key, return_stats=True, **cfg)

    t_frame, (fb, stats) = time_fn(frame, warmup=1, iters=2)
    assert int(stats["segments"]) > 0
    iters = int(stats["iters"])
    lanes = int(stats["lanes"])

    per_iter = t_frame / iters
    hit_it = t_hit
    res_it = t_hit_res - hit_it
    rec = {
        "metric": "phase_profile_huge_pool32k",
        "kernel": kernel,
        "iters": iters,
        "frame_s": t_frame,
        "per_iteration_us": per_iter * 1e6,
        "closest_hit_us": hit_it * 1e6,
        "resolve_us": res_it * 1e6,
        "shade_regen_and_rest_us": (per_iter - hit_it - res_it) * 1e6,
        "closest_hit_frac": hit_it / per_iter,
        "resolve_frac": res_it / per_iter,
        "ns_per_lane_slot_hit": hit_it / lanes * 1e9,
        "lanes": lanes,
        "occupancy": int(stats["segments"]) / (iters * lanes),
        "device": jax.devices()[0].platform,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
