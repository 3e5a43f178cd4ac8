#!/usr/bin/env python
"""A/B: cost of the bounce-0 stratified-scatter RECOMPUTE on the toolbox
arm (VERDICT r4 #6 -- the last open forward-perf item).

The fused kernel recomputes the stratified bounce-0 substitution
(planar.strat0_scatter_planes: pid arithmetic, two fold_ins, rotation
draws, the polar map) for every lane on EVERY iteration, though only
depth-0 lanes consume it. The alternative -- compute it once at regen
and carry +3 state planes -- can at best recover the WHOLE recompute
cost (it still pays the draws at regen, plus 3 planes of state traffic).
This script measures that upper bound directly: toolbox arm (rr +
stratified, huge 1200x800@100 d50) with the substitution on
(RTW_STRAT0_MODE=recompute, the shipped estimator) vs compiled OUT
(RTW_STRAT0_MODE=off -- estimator-changing, timing-only ablation).

Run on the real chip; each arm runs in its own subprocess so the env
knob is captured at import. Writes docs/STRAT0_AB_r05.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import dataclasses
import jax
from raytracinginoneweekend_tpu.config import DEFAULT, RenderConfig
from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.render import render_rays_count
from raytracinginoneweekend_tpu.utils.timing import time_fn
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)

enable_persistent_cache()
cfg = RenderConfig(width=1200, height=800, spp=100, max_depth=50,
                   camera_mode="thinlens", options=DEFAULT)
scene = huge_scene(seed=0)
cam = reference_cpu_camera(cfg.width, cfg.height)
key = jax.random.key(0)
options = dataclasses.replace(cfg.options, rr_terminate=True,
                              sampling="stratified")

def run():
    return render_wavefront(scene, cam, key, width=cfg.width,
                            height=cfg.height, spp=cfg.spp,
                            max_depth=cfg.max_depth,
                            camera_mode=cfg.camera_mode, options=options)

seconds, img = time_fn(run, warmup=1, iters=3)
rays = render_rays_count(cfg)
print(json.dumps({"seconds_per_frame": seconds,
                  "rays_per_s": rays / seconds,
                  "image_mean": float(img.mean())}))
""" % {"repo": REPO}


def run_arm(mode):
    env = dict(os.environ, RTW_STRAT0_MODE=mode)
    out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        raise SystemExit(f"arm {mode} failed")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["strat0_mode"] = mode
    print(f"{mode}: {rec['rays_per_s'] / 1e6:.2f} Mrays/s "
          f"({rec['seconds_per_frame']:.2f} s/frame)", file=sys.stderr,
          flush=True)
    return rec


def main():
    on = run_arm("recompute")
    off = run_arm("off")
    rec = {
        "metric": "strat0_recompute_cost_toolbox_arm",
        "config": "huge 1200x800@100spp d50, rr_terminate + stratified",
        "arm_recompute": on,
        "arm_off_timing_only": off,
        "recompute_cost_frac": 1.0 - (off["seconds_per_frame"]
                                      / on["seconds_per_frame"]),
        "note": "arm_off changes the estimator (bounce-0 back to iid); "
                "its time is the UPPER BOUND an at-regen substitution "
                "(+3 state planes) could reach. See ARCHITECTURE.md "
                "'Stratified bounce-0 at regen'.",
    }
    path = os.path.join(REPO, "docs", "STRAT0_AB_r05.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
