#!/usr/bin/env python
"""Benchmark the differentiable (inverse-rendering) train step on TPU.

VERDICT r2 item 7: the planar-AD train step's performance must gate like
the forward path's. Times make_train_step (forward render + backward
pass + adam update in ONE jitted program) on the simple CUDA scene at
4096 batch pixels x 8 spp (32k rays/step, the config of the round-2
"6.2x" claim), in two arms:

  * interior: plain interior AD (no surrogate terms);
  * full: boundary + secondary + rr_grad surrogates (the gradient
    machinery the FD suites validate).

Prints one JSON line; the round driver may redirect it to
docs/FIT_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import reference_cuda_camera
from raytracinginoneweekend_tpu.models.scene import simple_scene_cuda
from raytracinginoneweekend_tpu.optim.inverse import (make_train_step,
                                                      params_from_scene)
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn

W, H, SPP, DEPTH = 320, 180, 8, 8
BATCH = 4096
STEPS_PER_CALL = 20  # amortize dispatch: scan the step inside one jit


def arm(scene, cam, target, pixel_ids, label, **terms):
    opt = optax.adam(1e-2)
    params = params_from_scene(scene)
    opt_state = opt.init(params)
    step = make_train_step(opt, width=W, height=H, spp=SPP,
                           max_depth=DEPTH, camera_mode="cuda",
                           options=DEFAULT, **terms)

    def many(params, opt_state):
        def body(c, k):
            p, s = c
            p, s, loss = step(p, s, scene, cam, target, pixel_ids,
                              jax.random.fold_in(jax.random.key(1), k))
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(STEPS_PER_CALL))
        return params, opt_state, losses

    many_j = jax.jit(many)
    sec, (_, _, losses) = time_fn(lambda: many_j(params, opt_state),
                                  warmup=1, iters=3)
    assert bool(jnp.isfinite(losses).all())
    return {"label": label, "ms_per_step": sec / STEPS_PER_CALL * 1e3,
            "steps_per_s": STEPS_PER_CALL / sec}


def main() -> None:
    enable_persistent_cache()
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    pixel_ids = jax.random.choice(jax.random.key(3), W * H, (BATCH,),
                                  replace=False).astype(jnp.int32)
    target = jnp.zeros((BATCH, 3), jnp.float32) + 0.25

    interior = arm(scene, cam, target, pixel_ids, "interior")
    full = arm(scene, cam, target, pixel_ids, "full",
               boundary_samples=512, secondary_samples=4,
               secondary_vertex_depths=2, rr_grad=True)
    rec = {
        "metric": "train_step_simple_4096px_8spp_d8",
        "rays_per_step": BATCH * SPP,
        "interior": interior,
        "full": full,
        "device": str(jax.devices()[0].platform),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
