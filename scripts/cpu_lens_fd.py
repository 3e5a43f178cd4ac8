#!/usr/bin/env python
"""FD-validate the quirk-Q2 ("cpu" camera mode) boundary-term aperture
integration on a defocus-dominated config (VERDICT r4 #7).

Prints FD truth vs the round-5 fixed-point lens-integrated estimator vs
the pre-round-5 central-viewpoint ablation for each geometry component,
and writes docs/CPU_LENS_r05.json.
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
from raytracinginoneweekend_tpu.models.scene import LAMBERT, Scene
from raytracinginoneweekend_tpu.ops.silhouette import boundary_surrogate
from raytracinginoneweekend_tpu.optim import render_loss
from raytracinginoneweekend_tpu.render import render_pixels_impl

W, H, SPP, DEPTH = 96, 72, 64, 2
FD_EPS = 0.015
N_FD, N_AD = 4, 3


def main():
    scene = Scene(
        centers=jnp.array([[0.0, 0.0, -1.0], [-0.55, 0.0, -2.4]],
                          jnp.float32),
        radii=jnp.array([0.35, 0.5], jnp.float32),
        material_index=jnp.array([0, 0], jnp.int32),
        mtype=jnp.array([LAMBERT, LAMBERT], jnp.int32),
        albedo=jnp.array([[0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.array([0.0], jnp.float32),
        ior=jnp.array([1.0], jnp.float32))
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), W / H, 60.0, 0.6,
                      2.4)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    base = render_pixels_impl(scene, cam, ids, jax.random.key(3), width=W,
                              height=H, spp=SPP, wave_spp=SPP,
                              max_depth=DEPTH, camera_mode="cpu",
                              options=DEFAULT)
    target = base - 0.5
    cot = 2.0 * jax.lax.stop_gradient(base - target) / base.size

    @jax.jit
    def loss_fd(centers, radii, rkey):
        s = scene._replace(centers=centers, radii=radii)
        img = render_pixels_impl(s, cam, ids, rkey, width=W, height=H,
                                 spp=SPP, wave_spp=SPP, max_depth=DEPTH,
                                 camera_mode="cpu", options=DEFAULT)
        return jnp.mean((img - target) ** 2)

    def grad_fn(ablation):
        def f(params, skey):
            interior = render_loss(params, scene, cam, target, ids, skey,
                                   width=W, height=H, spp=SPP,
                                   max_depth=DEPTH, camera_mode="cpu",
                                   options=DEFAULT, engine="planar")
            s = scene._replace(centers=params["centers"],
                               radii=params["radii"])
            sur = boundary_surrogate(s, cam, "cpu", cot, W, H, skey,
                                     DEPTH, DEFAULT, n_angles=2048,
                                     _cpu_central_ablation=ablation)
            return interior + sur - jax.lax.stop_gradient(sur)
        return jax.jit(jax.grad(f))

    g_new = grad_fn(False)
    g_ctr = grad_fn(True)
    params = {"centers": scene.centers, "radii": scene.radii}
    news = [g_new(params, jax.random.key(100 + k)) for k in range(N_AD)]
    ctrs = [g_ctr(params, jax.random.key(100 + k)) for k in range(N_AD)]

    comps = [("centers", (0, 0)), ("centers", (0, 1)), ("centers", (0, 2)),
             ("radii", (0,)), ("centers", (1, 0)), ("radii", (1,))]
    rows = []
    for leaf, idx in comps:
        fds = []
        for k in range(N_FD):
            rk = jax.random.key(50 + k)
            up = dict(params)
            up[leaf] = params[leaf].at[idx].add(FD_EPS)
            dn = dict(params)
            dn[leaf] = params[leaf].at[idx].add(-FD_EPS)
            fds.append(float((loss_fd(up["centers"], up["radii"], rk)
                              - loss_fd(dn["centers"], dn["radii"], rk))
                             / (2 * FD_EPS)))
        fd, fd_se = float(np.mean(fds)), float(np.std(fds) / np.sqrt(N_FD))
        new = float(np.mean([float(g[leaf][idx]) for g in news]))
        ctr = float(np.mean([float(g[leaf][idx]) for g in ctrs]))
        rows.append({"component": f"{leaf}{list(idx)}", "fd": fd,
                     "fd_se": fd_se, "ad_lens_integrated": new,
                     "ad_central_ablation": ctr,
                     "err_new": new - fd, "err_central": ctr - fd})
        print(f"{leaf}{idx}: FD={fd:+.4f}+-{fd_se:.4f} "
              f"new={new:+.4f} (err {new-fd:+.4f})  "
              f"central={ctr:+.4f} (err {ctr-fd:+.4f})", flush=True)

    out = {"config": {"w": W, "h": H, "spp": SPP, "max_depth": DEPTH,
                      "aperture": 0.6, "camera_mode": "cpu",
                      "fd_eps": FD_EPS, "n_fd_keys": N_FD,
                      "n_ad_keys": N_AD,
                      "device": jax.devices()[0].platform},
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "CPU_LENS_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
