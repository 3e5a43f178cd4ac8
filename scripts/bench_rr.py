#!/usr/bin/env python
"""A/B the opt-in Russian-roulette path termination on the headline config.

TODO.md's queued measurement: estimated +8-15% rays/s when enabled on the
huge scene 1200x800 @ 100spp d50 (the headline bench keeps it OFF because it
measures the reference-faithful estimator -- the reference never terminates
paths early, /root/reference/src/main.cxx:60-74).

Prints one JSON line with both arms: rays/s, segments traced, occupancy,
and the global image-mean relative error (unbiasedness check).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import jax
except ModuleNotFoundError:  # pragma: no cover
    _venv = "/opt/venv/bin/python"
    if os.path.exists(_venv) and os.environ.get("RTW_BENCH_REEXEC") != "1":
        os.environ["RTW_BENCH_REEXEC"] = "1"
        os.execv(_venv, [_venv] + sys.argv)
    raise

import numpy as np

from raytracinginoneweekend_tpu.config import DEFAULT, RenderConfig
from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.render import render_rays_count
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn


def main() -> None:
    enable_persistent_cache()
    small = "--small" in sys.argv
    if small:
        cfg = RenderConfig(width=240, height=160, spp=8, max_depth=12,
                           camera_mode="thinlens", options=DEFAULT)
    else:
        cfg = RenderConfig(width=1200, height=800, spp=100, max_depth=50,
                           camera_mode="thinlens", options=DEFAULT)
    scene = huge_scene(seed=0)
    cam = reference_cpu_camera(cfg.width, cfg.height)
    key = jax.random.key(0)
    rays = render_rays_count(cfg)

    arms = {}
    for name, rr in (("off", False), ("on", True)):
        opts = dataclasses.replace(cfg.options, rr_terminate=rr)

        def run(opts=opts):
            return render_wavefront(
                scene, cam, key, width=cfg.width, height=cfg.height,
                spp=cfg.spp, max_depth=cfg.max_depth,
                camera_mode=cfg.camera_mode, options=opts,
                return_stats=True)

        seconds, (fb, stats) = time_fn(run, warmup=1, iters=3)
        iters = int(stats["iters"])
        segs = int(stats["segments"])
        lanes = int(stats["lanes"])
        arms[name] = {
            "rays_per_s": rays / seconds,
            "seconds_per_frame": seconds,
            "segments": segs,
            "iters": iters,
            "occupancy": segs / (iters * lanes),
            "mean": float(np.asarray(fb).mean()),
        }

    rec = {
        "metric": ("rr_terminate_ab_huge_1200x800_100spp_d50"
                   if not small else "rr_terminate_ab_small"),
        "off": arms["off"],
        "on": arms["on"],
        "speedup": arms["on"]["rays_per_s"] / arms["off"]["rays_per_s"],
        "segments_saved": 1.0 - arms["on"]["segments"] / arms["off"]["segments"],
        "mean_rel_err": abs(arms["on"]["mean"] - arms["off"]["mean"])
        / arms["off"]["mean"],
        "device": str(jax.devices()[0].platform),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
