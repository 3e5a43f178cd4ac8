#!/usr/bin/env python
"""Benchmark the reference's OWN active configuration (VERDICT r3 item 4).

The reference's shipped workload is the CUDA path on the simple scene at
1920x1080, 48 samples/pixel, 32 bounces (/root/reference/src/main.cxx:26-31,
src/CUDA/cuda_impl.cu:59-60, scene at cuda_impl.cu:404-417). The reference
itself publishes no timings (BASELINE.md), so this artifact is the repo's
reproducible record of the most directly reference-comparable number --
previously only README prose.

Two arms:
  * thinlens/default  -- the framework's corrected-physics default camera
    and options on the same workload;
  * reference-cuda    -- camera_mode="cuda" (no defocus, quirk Q1) +
    REFERENCE_CUDA compat options: the reference's exact semantics, the
    configuration validated statistically against the compiled C++ math in
    tests/test_reference_parity.py.

Prints one JSON line; the round driver / operator redirects it to
docs/REF_ACTIVE_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from raytracinginoneweekend_tpu.config import DEFAULT, REFERENCE_CUDA
from raytracinginoneweekend_tpu.models.camera import reference_cuda_camera
from raytracinginoneweekend_tpu.models.scene import simple_scene_cuda
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn

W, H, SPP, DEPTH = 1920, 1080, 48, 32


def arm(scene, cam, key, camera_mode, options, iters=4):
    def run():
        return render_wavefront(scene, cam, key, width=W, height=H,
                                spp=SPP, max_depth=DEPTH,
                                camera_mode=camera_mode, options=options)

    seconds, _ = time_fn(run, warmup=1, iters=iters)
    _, stats = render_wavefront(scene, cam, key, width=W, height=H,
                                spp=SPP, max_depth=DEPTH,
                                camera_mode=camera_mode, options=options,
                                return_stats=True)
    rays = W * H * SPP
    segs = int(stats["segments"])
    return {
        "rays_per_s": rays / seconds,
        "mrays_per_s": rays / seconds / 1e6,
        "seconds_per_frame": seconds,
        "segments": segs,
        "segments_per_s": segs / seconds,
        "occupancy": segs / (int(stats["iters"]) * int(stats["lanes"])),
    }


def main() -> None:
    enable_persistent_cache()
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(0)

    record = {
        "metric": "reference_active_config_simple_1920x1080_48spp_d32",
        "workload": "main.cxx:26-31 + cuda_impl.cu:59-60 (the reference's "
                    "shipped CUDA render)",
        "camera_rays": W * H * SPP,
        "device": str(jax.devices()[0].platform),
        "arms": {
            "thinlens_default": arm(scene, cam, key, "thinlens", DEFAULT),
            "reference_cuda_compat": arm(scene, cam, key, "cuda",
                                         REFERENCE_CUDA),
        },
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
