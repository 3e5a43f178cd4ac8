#!/usr/bin/env python
"""Estimator efficiency frontier: sampling x Russian-roulette grid.

The two opt-in estimator changes compose: stratified sampling lowers
variance at ~3% time cost; RR termination lowers time ~22% at ~1-7%
variance cost (rr defaults tuned in round 3, docs/RR_EFFICIENCY_r03).
This measures all four combinations on one config -- variance across
keys AND device time, efficiency = 1 / (var_ratio * time_ratio)
normalized to the reference-faithful iid/rr-off estimator.

Config: huge scene, thinlens 600x400 @ 24 spp depth 50 (the RR-tuning
scale; same estimator physics as the headline at 1/16 the pixels).

Usage: python scripts/bench_frontier.py   (real TPU)
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
from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn

W, H, SPP, DEPTH = 600, 400, 24, 50
N_KEYS = 6


def main() -> None:
    enable_persistent_cache()
    scene = huge_scene(seed=0)
    cam = reference_cpu_camera(W, H)

    def run(options, key):
        return render_wavefront(scene, cam, key, width=W, height=H,
                                spp=SPP, max_depth=DEPTH,
                                camera_mode="thinlens", options=options)

    combos = {}
    for sampling in ("iid", "stratified"):
        for rr in (False, True):
            o = dataclasses.replace(DEFAULT, sampling=sampling,
                                    rr_terminate=rr)
            sec, _ = time_fn(lambda: run(o, jax.random.key(0)),
                             warmup=1, iters=3)
            frames = np.stack([np.asarray(run(o, jax.random.key(k)))
                               for k in range(N_KEYS)])
            combos[f"{sampling}/rr-{'on' if rr else 'off'}"] = {
                "seconds": sec,
                "var": float(frames.var(0, ddof=1).mean()),
                "mean": float(frames.mean()),
            }

    base = combos["iid/rr-off"]
    rows = {}
    for name, c in combos.items():
        vr = c["var"] / base["var"]
        tr = c["seconds"] / base["seconds"]
        rows[name] = {"var_ratio": round(vr, 4),
                      "time_ratio": round(tr, 4),
                      "eff_vs_ref_faithful": round(1.0 / (vr * tr), 4),
                      "mean_rel_err": round(
                          abs(c["mean"] - base["mean"]) / base["mean"], 6)}
    print(json.dumps({
        "metric": "estimator_efficiency_frontier_huge_600x400_24spp_d50",
        "note": "eff = 1/(var_ratio*time_ratio) vs the reference-faithful"
                " iid/rr-off estimator; variance across 6 keys, device"
                " time via time_fn; both changes opt-in and unbiased",
        "rows": rows,
        "device": str(jax.devices()[0].platform)}))


if __name__ == "__main__":
    main()
