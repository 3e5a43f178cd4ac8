#!/usr/bin/env python
"""Cost curve of the delta-lobe term's internal-RR reflection arms
(render_loss rr_grad_arms -> branchprob chain_rr_arms) at flagship
scale -- the dominant phase of the full-surrogate train step
(docs/FIT_r05.json: rr_grad is 48% of the 304.5 ms step).

Writes docs/RR_ARMS_COST_r05.json. Accuracy ground for arms >= 1:
tests/test_branchprob.py::
test_internal_rr_reflection_arm_matches_finite_differences.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.ops.branchprob import (
    branch_probability_surrogate)
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn

W, H, DEPTH, BATCH = 1200, 800, 50, 16384


def main():
    enable_persistent_cache()
    scene = huge_scene(seed=0)
    cam = reference_cpu_camera(W, H)
    ids = jax.random.choice(jax.random.key(3), W * H, (BATCH,),
                            replace=False).astype(jnp.int32)
    cot = jnp.ones((BATCH, 3), jnp.float32) * 1e-6
    key = jax.random.key(9)
    params = {"centers": scene.centers, "radii": scene.radii,
              "ior": scene.ior}
    out = {}
    for arms in (0, 1, 2):
        def g_rr(p):
            s = scene._replace(**p)
            tot = 0.0
            for b in range(2):
                tot = tot + branch_probability_surrogate(
                    s, cam, "thinlens", cot, ids, W, H,
                    jax.random.fold_in(key, b), DEPTH, DEFAULT,
                    vertex_depth=b, chain_rr_arms=arms)
            return tot

        gj = jax.jit(jax.grad(g_rr))
        sec = None
        for attempt in range(3):
            try:
                sec, _ = time_fn(lambda: gj(params), warmup=1, iters=3)
                break
            except Exception as e:  # transient tunnel compile failures
                print(f"arms={arms} attempt {attempt}: {str(e)[:120]}",
                      file=sys.stderr, flush=True)
                time.sleep(20)
        if sec is None:
            raise RuntimeError(
                f"arms={arms}: all timing attempts failed (see stderr)")
        out[f"arms_{arms}"] = round(sec * 1e3, 1)
        print(f"chain_rr_arms={arms}: {sec * 1e3:.1f} ms/grad-eval",
              file=sys.stderr, flush=True)

    rec = {
        "metric": "rr_grad_arms_cost_curve_flagship",
        "config": f"huge scene, {W}x{H} cam, depth {DEPTH}, "
                  f"{BATCH}-pixel batch, vertex depths 0+1, grad wrt "
                  "(centers, radii, ior), time_fn warmup 1 iters 3",
        "script": "scripts/bench_rr_arms.py",
        "ms_per_grad_eval": out,
        "device": jax.devices()[0].platform,
        "note": "each internal-RR reflection arm adds ~21% of the "
                "delta-lobe phase (the dominant full-surrogate phase, "
                "docs/FIT_r05.json). Exposed as "
                "render_loss(rr_grad_arms=...).",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "RR_ARMS_COST_r05.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
