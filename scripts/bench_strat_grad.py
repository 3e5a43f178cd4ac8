#!/usr/bin/env python
"""Does the stratified estimator reduce GRADIENT variance for fit?

Measures the per-leaf variance of jax.grad(render_loss) across step
keys, iid vs stratified, on the simple scene (albedo + centers leaves,
thinlens). Also checks the gradient MEANS agree (the stratified
estimator is unbiased, so E[grad] must match within MC noise).
"""
from __future__ import annotations

import dataclasses
import json
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import reference_cuda_camera
from raytracinginoneweekend_tpu.models.scene import simple_scene_cuda
from raytracinginoneweekend_tpu.optim import params_from_scene, render_loss

W, H, SPP, DEPTH = 96, 54, 8, 8
BATCH = 1024
N_KEYS = 24


def main():
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    params = params_from_scene(scene, ("albedo", "centers"))
    ids = jax.random.choice(jax.random.key(3), W * H, (BATCH,),
                            replace=False).astype(jnp.int32)
    target = jnp.zeros((BATCH, 3), jnp.float32) + 0.3

    out = {}
    for smp in ("iid", "stratified"):
        o = dataclasses.replace(DEFAULT, sampling=smp)
        gfn = jax.jit(jax.grad(lambda p, k: render_loss(
            p, scene, cam, target, ids, k, width=W, height=H, spp=SPP,
            max_depth=DEPTH, camera_mode="thinlens", options=o)))
        gs = [gfn(params, jax.random.key(100 + k)) for k in range(N_KEYS)]
        rows = {}
        for leaf in ("albedo", "centers"):
            stack = np.stack([np.asarray(g[leaf]) for g in gs])
            rows[leaf] = {"var": float(stack.var(0, ddof=1).mean()),
                          "mean_norm": float(
                              np.abs(stack.mean(0)).mean())}
        out[smp] = rows
    rec = {"metric": "stratified_gradient_variance_simple_1024px_8spp",
           "rows": {leaf: {
               "var_ratio_strat_over_iid": round(
                   out["stratified"][leaf]["var"]
                   / out["iid"][leaf]["var"], 4),
               "mean_norm_iid": out["iid"][leaf]["mean_norm"],
               "mean_norm_stratified":
                   out["stratified"][leaf]["mean_norm"],
           } for leaf in ("albedo", "centers")},
           "n_keys": N_KEYS,
           "device": str(jax.devices()[0].platform)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
