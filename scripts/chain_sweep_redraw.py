#!/usr/bin/env python
"""Does exit-cone re-jitter sampling cut the mirror-chain sweep residual?
(VERDICT r4 #4 -- the magnified exit-cone undersampling family.)

The round-4 decomposition (ARCHITECTURE.md "Chain-sweep bias
decomposition") pinned the reproducer's remaining +0.031 residual on two
families: (a) through-lens lanes whose exit-cone crossings are sparse in
g-space (kernel mass rarely lands on them -- an UNDERSAMPLING problem),
and (b) RR-threshold / reflection-arm flips whose chain-edge dg has the
opposite sign (structurally invisible to any g-kernel on the chain
edge). ``sweep_redraws=M`` re-runs each lane's camera ray -> prefix walk
-> chain at M fresh uniform pixel jitters (exact recompute, same per-ray
keys, original candidate edge + probe step reused) -- an M-fold variance
cut on exactly the kernel factor family (a) starves.

This script measures, across many keys on the reproducer (FD truth from
its own key set): bias and SE of the attached estimator at M = 0 (the
shipped single-sample kernel), 2, 4, 8. If family (a) was the binding
residual the bias should fall toward family (b)'s floor; if the bias is
unchanged the residual is (b) -- either way the decomposition gets a
measured update. Writes docs/CHAIN_SWEEP_r05.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import make_camera
from raytracinginoneweekend_tpu.models.scene import (DIELECTRIC, LAMBERT,
                                                     METAL, Scene)
from raytracinginoneweekend_tpu.ops.branchprob import (
    branch_probability_surrogate)
from raytracinginoneweekend_tpu.render import render_pixels_impl

W, H, SPP, DEPTH = 48, 36, 64, 4
N_FD = int(os.environ.get("SWEEP_FD_KEYS", "6"))
N_AD = int(os.environ.get("SWEEP_AD_KEYS", "16"))
ARMS = (0, 2, 4, 8)
FD_EPS = 0.05


def main():
    scene = Scene(
        centers=jnp.array([[0.0, -100.0, -2.0], [0.0, 1.6, -2.0],
                           [0.0, 4.6, -2.0]], jnp.float32),
        radii=jnp.array([100.0, 0.8, 1.6], jnp.float32),
        material_index=jnp.array([0, 1, 2], jnp.int32),
        mtype=jnp.array([METAL, DIELECTRIC, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.9, 0.9, 0.9], [1.0, 1.0, 1.0],
                          [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.zeros(3, jnp.float32),
        ior=jnp.array([1.0, 1.5, 1.0], jnp.float32))
    cam = make_camera((0.0, 1.2, 0.8), (0.0, 0.0, -2.0), (0, 1, 0),
                      W / H, 45.0, 0.0, 1.0)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    base_key = jax.random.key(3)
    base = render_pixels_impl(scene, cam, ids, base_key, width=W,
                              height=H, spp=SPP, wave_spp=SPP,
                              max_depth=DEPTH, camera_mode="pinhole",
                              options=DEFAULT)
    target = base - 0.5

    @jax.jit
    def mse_at(cy, rkey):
        s = scene._replace(centers=scene.centers.at[0, 1].add(cy))
        img = render_pixels_impl(s, cam, ids, rkey, width=W, height=H,
                                 spp=SPP, wave_spp=SPP, max_depth=DEPTH,
                                 camera_mode="pinhole", options=DEFAULT)
        return jnp.mean((img - target) ** 2)

    fds = [float((mse_at(FD_EPS, jax.random.key(200 + k))
                  - mse_at(-FD_EPS, jax.random.key(200 + k)))
                 / (2 * FD_EPS)) for k in range(N_FD)]
    truth = float(np.mean(fds))
    truth_se = float(np.std(fds, ddof=1) / np.sqrt(N_FD))
    print(f"FD truth {truth:+.4f} +- {truth_se:.4f}", file=sys.stderr,
          flush=True)

    def make_ad(m):
        def f(params, skey):
            s = scene._replace(**params)
            img = render_pixels_impl(s, cam, ids, base_key, width=W,
                                     height=H, spp=SPP, wave_spp=SPP,
                                     max_depth=DEPTH,
                                     camera_mode="pinhole",
                                     options=DEFAULT, differentiable=True)
            diff = img - target
            val = jnp.mean(diff * diff)
            cot = 2.0 * jax.lax.stop_gradient(diff) / diff.size
            for b in (0, 1):
                sur = branch_probability_surrogate(
                    s, cam, "pinhole", cot, ids, W, H,
                    jax.random.fold_in(skey, 0x8800 + b), DEPTH, DEFAULT,
                    vertex_depth=b, sweep_redraws=m)
                val = val + sur - jax.lax.stop_gradient(sur)
            return val
        return jax.jit(lambda p, k: jax.grad(f)(p, k))

    rows = {}
    params = {"centers": scene.centers}
    for m in ARMS:
        ad = make_ad(m)
        vals = np.array([float(ad(params, jax.random.key(100 + k))
                               ["centers"][0, 1]) for k in range(N_AD)])
        rows[f"M{m}"] = {
            "mean": float(vals.mean()),
            "se": float(vals.std(ddof=1) / np.sqrt(N_AD)),
            "bias": float(vals.mean() - truth),
            "bias_over_se": float(abs(vals.mean() - truth)
                                  / max(vals.std(ddof=1) / np.sqrt(N_AD),
                                        1e-12)),
            "n": N_AD,
        }
        print(f"M={m}: {vals.mean():+.4f} +- {rows[f'M{m}']['se']:.4f} "
              f"(bias {rows[f'M{m}']['bias']:+.4f})", file=sys.stderr,
              flush=True)

    out = {
        "metric": "mirror_chain_sweep_redraw_bias",
        "config": "mirror ground -> glass -> occluder, 48x36 spp64 d4, "
                  "grad wrt mirror center y; vertex_depth 0+1 attached",
        "fd_truth": {"mean": truth, "se": truth_se, "n": N_FD},
        "arms": rows,
        "device": jax.devices()[0].platform,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "CHAIN_SWEEP_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
