#!/usr/bin/env python
"""Dual-pool engine A/B on primary-dominant workloads (VERDICT r3 item 6).

The dual-pool (coherence-split) engine measurably culls ~6x the
candidate tests on its primary pool but lost end-to-end on the flagship
deep config (secondary-pool packing, ARCHITECTURE.md). This bench gives
it the workloads its design favors -- primary-dominant renders (low
depth, pinhole) -- and records the verdict either way:

  * huge scene, 1200x800, depth 2 / 4 (thinlens, 32 spp);
  * huge scene, pinhole, depth 1 (pure primary visibility + sky).

Prints one JSON line -> docs/DUAL_AB_r04.json. If the dual pool wins a
regime, cli.py's --engine auto should route that regime to it; if it
loses everywhere, it stays ablation-only (documented in
ARCHITECTURE.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.ops.wavefront_dual import (
    render_wavefront_dual)
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn

CONFIGS = [
    ("huge_d2_thinlens_32spp", dict(width=1200, height=800, spp=32,
                                    max_depth=2, camera_mode="thinlens")),
    ("huge_d4_thinlens_32spp", dict(width=1200, height=800, spp=32,
                                    max_depth=4, camera_mode="thinlens")),
    ("huge_d1_pinhole_32spp", dict(width=1200, height=800, spp=32,
                                   max_depth=1, camera_mode="pinhole")),
]


def main() -> None:
    enable_persistent_cache()
    scene = huge_scene(seed=0)
    cam = reference_cpu_camera(1200, 800)
    key = jax.random.key(0)
    out = {"metric": "dual_pool_ab_primary_dominant", "configs": {}}
    for name, cfg in CONFIGS:
        rays = cfg["width"] * cfg["height"] * cfg["spp"]
        rec = {}
        for label, fn in (("single", render_wavefront),
                          ("dual", render_wavefront_dual)):
            sec, _ = time_fn(
                lambda fn=fn: fn(scene, cam, key, options=DEFAULT, **cfg),
                warmup=1, iters=3)
            rec[label] = {"seconds_per_frame": sec,
                          "mrays_per_s": rays / sec / 1e6}
        rec["dual_over_single"] = (rec["single"]["seconds_per_frame"]
                                   / rec["dual"]["seconds_per_frame"])
        out["configs"][name] = rec
        print(f"# {name}: single {rec['single']['mrays_per_s']:.1f} "
              f"dual {rec['dual']['mrays_per_s']:.1f} Mrays/s "
              f"(dual speedup {rec['dual_over_single']:.3f}x)",
              file=sys.stderr, flush=True)
    out["device"] = str(jax.devices()[0].platform)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
