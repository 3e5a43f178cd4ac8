#!/usr/bin/env python
"""The depth-bounded demonstration workload for the exact work-reduction
family (hit_kernel="sorted" + ownership="tile").

The huge scene measured ~breakeven for the whole family because its
beams have unbounded depth spread (ARCHITECTURE.md, the sorted-exit
ablation chain). This is the counterpart measurement on the workload
the machinery was designed for: a close-up of a dense 22x22 sphere wall
(models/scene.wall_scene) where every primary hit lands in a ~[3.5, 5.5]
distance band and a tile-owned kernel block's beam sees only its own
wall patch.

Arms: {sublane, sorted} x {strided, tile} at the wall close-up, plus a
depth-1 (primary-only) variant. pixel_mismatch_frac reports exact
pixel inequality vs the sublane/strided baseline: depth-1 images are
bit-identical; at depth >= 2 the tile arms differ in the documented
program-context class (the own_bl kernel variant contracts the shade
tier's FMAs differently on real TPU -> ~1-ulp scatter directions,
~0.2% of pixels ulp-different after bounce amplification, ~2e-6
knife-edge flips -- ARCHITECTURE.md, the tile-ownership section).

Measured result (v5e, docs/WALL_SORTED_r04.json): sorted+tile wins
1.17x on the primary-only wall -- the demonstrated winning workload
for the exact work-reduction family; all combos ~level at depth 4.

Usage: python scripts/bench_wall.py [--small]
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

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import make_camera
from raytracinginoneweekend_tpu.models.scene import wall_scene
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn


def wall_camera(width: int, height: int):
    """Close-up: 4 units from the wall center, pinhole-framed so the
    wall fills the frame (no sky primaries)."""
    return make_camera((0.0, 11.0, 4.0), (0.0, 11.0, 0.0), (0, 1, 0),
                       float(width) / float(height), 60.0, 0.0, 4.0)


def main() -> None:
    enable_persistent_cache()
    small = "--small" in sys.argv
    w, h, spp = (240, 160, 8) if small else (1200, 800, 50)
    scene = wall_scene(0)
    cam = wall_camera(w, h)
    key = jax.random.key(0)

    record = {"metric": "wall_scene_sorted_tile_ab",
              "spheres": int(scene.num_spheres),
              "configs": {}, "device": None}
    for depth in (4, 1):
        rays = w * h * spp
        arms = {}
        base_img = None
        for hk, own in (("sublane", "strided"), ("sublane", "tile"),
                        ("sorted", "strided"), ("sorted", "tile")):
            o = dataclasses.replace(DEFAULT, hit_kernel=hk, ownership=own)

            def run(o=o):
                return render_wavefront(
                    scene, cam, key, width=w, height=h, spp=spp,
                    max_depth=depth, camera_mode="pinhole", options=o)

            sec, img = time_fn(run, warmup=1, iters=2 if small else 3)
            img = np.asarray(img)
            assert np.isfinite(img).all()
            if base_img is None:
                base_img = img
                mismatch = 0.0
            else:
                mismatch = float((img != base_img).mean())
            arms[f"{hk}/{own}"] = {
                "seconds_per_frame": sec,
                "mrays_per_s": rays / sec / 1e6,
                "pixel_mismatch_frac": mismatch,
            }
        base = arms["sublane/strided"]["mrays_per_s"]
        for v in arms.values():
            v["vs_sublane_strided"] = round(v["mrays_per_s"] / base, 4)
        record["configs"][f"{w}x{h}_{spp}spp_d{depth}"] = arms
    record["device"] = str(jax.devices()[0].platform)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
