#!/usr/bin/env python
"""AD-engine depth sweep: planar fixed-depth scan vs regenerative pool.

Source of the `--ad-engine auto` crossover policy
(optim.inverse.AD_ENGINE_AUTO_DEPTH / resolve_ad_engine): per depth,
time one train step (scanned STEPS_PER_CALL times inside one jit to
amortize the ~50 ms tunnel dispatch) for

  * planar      -- fixed-depth scan (ops/integrate_planar.py),
  * wavefront   -- regenerative pool (ops/wavefront_ad.py) on its
                   guaranteed worst-case budget (what `auto` uses:
                   no per-batch probing),
  * both again with rr_terminate=True (round 4: RR in the AD path).
    RR shortens the pool's drain (fewer iterations of real work behind
    the epoch conds) but saves the fixed-trip scan nothing, so the
    crossover depth SHIFTS DOWN under rr -- resolve_ad_engine takes
    rr_terminate into account (AD_ENGINE_AUTO_DEPTH_RR).

Prints one JSON line; redirect to docs/AD_DEPTH_SWEEP_r{N}.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.optim.inverse import (make_train_step,
                                                      params_from_scene)
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn

W, H, SPP = 1200, 800, 8
BATCH = 16384
POOL = 8192
STEPS_PER_CALL = 10
# The rr-off crossover (breakeven at 32) is already recorded in
# docs/AD_DEPTH_SWEEP_r04.json; this sweep brackets the RR-ON crossover
# (each depth x arm is its own tunnel compile -- keep the grid tight).
DEPTHS = (16, 24, 32, 40)


def step_ms(scene, cam, target, pixel_ids, depth, options, engine,
            engine_opts=None):
    opt = optax.adam(1e-2)
    params = params_from_scene(scene)
    opt_state = opt.init(params)
    step = make_train_step(opt, width=W, height=H, spp=SPP,
                           max_depth=depth, camera_mode="thinlens",
                           options=options, engine=engine,
                           engine_opts=engine_opts or {})

    def many(params, opt_state):
        def body(c, k):
            p, s = c
            p, s, loss = step(p, s, scene, cam, target, pixel_ids,
                              jax.random.fold_in(jax.random.key(1), k))
            return (p, s), loss

        return jax.lax.scan(body, (params, opt_state),
                            jnp.arange(STEPS_PER_CALL))[0]

    many_j = jax.jit(many)
    sec, _ = time_fn(lambda: many_j(params, opt_state), warmup=1, iters=2)
    return sec / STEPS_PER_CALL * 1e3


def main() -> None:
    enable_persistent_cache()
    scene = huge_scene(seed=0)
    cam = reference_cpu_camera(W, H)
    pixel_ids = jax.random.choice(jax.random.key(3), W * H, (BATCH,),
                                  replace=False).astype(jnp.int32)
    target = jnp.zeros((BATCH, 3), jnp.float32) + 0.25
    rr = dataclasses.replace(DEFAULT, rr_terminate=True)

    rows = {}
    for depth in DEPTHS:
        wf_opts = dict(pool_size=POOL)
        r = {
            "planar_rr_ms": step_ms(scene, cam, target, pixel_ids, depth,
                                    rr, "planar"),
            "wavefront_rr_ms": step_ms(scene, cam, target, pixel_ids,
                                       depth, rr, "wavefront", wf_opts),
        }
        r["wavefront_over_planar_rr"] = (r["planar_rr_ms"]
                                         / r["wavefront_rr_ms"])
        rows[str(depth)] = r
        print(f"# d{depth} rr: planar {r['planar_rr_ms']:.1f} wf "
              f"{r['wavefront_rr_ms']:.1f} ratio "
              f"{r['wavefront_over_planar_rr']:.2f}", file=sys.stderr)

    print(json.dumps({
        "metric": "ad_engine_depth_sweep_rr_huge_16384px_8spp",
        "rays_per_step": BATCH * SPP,
        "pool_lanes": POOL,
        "note": "rr_terminate=True arms; worst-case wavefront budget "
                "(the auto policy's regime); ratios > 1 mean the "
                "regenerative pool wins. rr-off sweep: "
                "docs/AD_DEPTH_SWEEP_r04.json (breakeven at 32)",
        "depths": rows,
        "device": str(jax.devices()[0].platform)}))


if __name__ == "__main__":
    main()
