#!/usr/bin/env python
"""Is the rim config's delta-lobe residual kernel-smoothing bias?

docs/RIM_OWNERSHIP_r05.json (96 keys) promoted the RR + sweep pair's
imperfect cancellation on the all-rim-band frame to a measured bias:
net +0.151 +- 0.039 above ~0 (FD is carried by the boundary term
alone). Both delta-lobe estimators smooth their crossing deltas with
kernels (TIR sigmoid of width ``tir_bandwidth``; triangular angular
kernel of width ``sweep_bandwidth``), each with O(h) bias from probing
radiance at band lanes instead of exactly at the crossing -- and the
rim frame is ALL band. If the residual is O(h), halving/quartering the
bandwidths should shrink it toward 0 at 1/h-growing variance; if it is
flat in h, the bias lives in the probe values themselves
(grazing-incidence family) and bandwidths are exonerated.

Writes docs/RIM_BANDWIDTH_r05.json: pair-net (rr + sweep, CRN-paired
per key) at (tir_bw, sweep_bw) in {default (0.02, 0.03), half, quarter}
across N keys.
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
                                                     Scene)
from raytracinginoneweekend_tpu.ops.branchprob import (
    branch_probability_surrogate)
from raytracinginoneweekend_tpu.render import render_pixels_impl

W, H, SPP, DEPTH = 48, 36, 64, 6
N_KEYS = int(os.environ.get("RIMBW_KEYS", "48"))
ARMS = [("default", 0.02, 0.03), ("half", 0.01, 0.015),
        ("quarter", 0.005, 0.0075)]


def main():
    scene = Scene(
        centers=jnp.array([[0.0, 0.0, -3.0], [0.0, 0.0, -60.0]],
                          jnp.float32),
        radii=jnp.array([1.0, 50.0], jnp.float32),
        material_index=jnp.array([0, 1], jnp.int32),
        mtype=jnp.array([DIELECTRIC, LAMBERT], jnp.int32),
        albedo=jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]], jnp.float32),
        fuzz=jnp.zeros(2, jnp.float32),
        ior=jnp.array([1.5, 1.0], jnp.float32))
    cam = make_camera((0, 0, 0), (1.0, 0.0, -2.83), (0, 1, 0), W / H,
                      10.0, 0.0, 1.0)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    base = render_pixels_impl(scene, cam, ids, jax.random.key(3),
                              width=W, height=H, spp=SPP, wave_spp=SPP,
                              max_depth=DEPTH, camera_mode="pinhole",
                              options=DEFAULT)
    target = base - 0.5
    cot = 2.0 * jax.lax.stop_gradient(base - target) / base.size

    def pair_grad(skey, tir_bw, sweep_bw):
        def f(radii):
            s = scene._replace(radii=radii)
            return branch_probability_surrogate(
                s, cam, "pinhole", cot, ids, W, H, skey, DEPTH, DEFAULT,
                tir_bandwidth=tir_bw, sweep_bandwidth=sweep_bw)
        return jax.grad(f)(scene.radii)[0]

    out = {}
    for name, tbw, sbw in ARMS:
        gj = jax.jit(lambda k, t=tbw, s=sbw: pair_grad(k, t, s))
        vals = np.array([float(gj(jax.random.key(100 + k)))
                         for k in range(N_KEYS)])
        trim = np.sort(vals)[max(N_KEYS // 10, 1):-max(N_KEYS // 10, 1)]
        out[name] = {
            "tir_bandwidth": tbw, "sweep_bandwidth": sbw,
            "pair_net_mean": float(vals.mean()),
            "se": float(vals.std(ddof=1) / np.sqrt(N_KEYS)),
            "trimmed_mean": float(trim.mean()),
            "n": N_KEYS,
        }
        print(f"{name} (tir {tbw}, sweep {sbw}): pair net "
              f"{vals.mean():+.3f} +- {out[name]['se']:.3f} "
              f"(trim {trim.mean():+.3f})", file=sys.stderr, flush=True)

    rec = {
        "metric": "rim_delta_lobe_pair_net_vs_kernel_bandwidth",
        "config": "glass-on-black rim zoom, d(loss)/d(radius), the pair "
                  "should net ~0 (boundary alone ~= FD; "
                  "docs/RIM_OWNERSHIP_r05.json)",
        "arms": out,
        "device": jax.devices()[0].platform,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "RIM_BANDWIDTH_r05.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
