#!/usr/bin/env python
"""Vertex-depth coverage sweep of the delta-lobe pair on the rim frame.

Completes the round-5 rim-residual elimination chain
(docs/RIM_OWNERSHIP_r05.json measured the vertex_depth=0 channels only;
docs/RIM_BANDWIDTH_r05.json exonerated the smoothing kernels; the
probe_delta_diel sweep exonerated the sweep term's deep probe). This
script sums branch_probability_surrogate over vertex depths 0..D-1 and
measures the pair net per coverage. Finding (48 keys, truth for the
pair ~= FD_total - boundary ~= -0.01):

    depth 0 only : +0.110 +- 0.040   (the ownership study's coverage)
    depths 0..1  : -0.133 +- 0.041   (the designed per-interface sum)
    depths 0..2+ : saturated (no deeper dielectric vertices in budget)

The two coverages BRACKET the truth almost symmetrically: the
per-interface RR channels on this all-rim-band adversarial frame are
individually large (depth-0 +0.11, depth-1 -0.24) and their sum misses
the ~0 truth by ~|0.12| at 3 sigma either way -- the honest bound for
the grazing-incidence family (specular-manifold territory). Writes
docs/RIM_DEPTH_r05.json.
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
N_KEYS = int(os.environ.get("RIMVD_KEYS", "48"))


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

    def pair(skey, n_depths):
        def f(r):
            s = scene._replace(radii=r)
            tot = 0.0
            for b in range(n_depths):
                if DEPTH - 1 - b <= 0:
                    break
                tot = tot + branch_probability_surrogate(
                    s, cam, "pinhole", cot, ids, W, H,
                    jax.random.fold_in(skey, 0x8900 + b), DEPTH, DEFAULT,
                    vertex_depth=b)
            return tot
        return jax.grad(f)(scene.radii)[0]

    out = {}
    for nd in (1, 2, 3, 5):
        gj = jax.jit(lambda k, n=nd: pair(k, n))
        vals = np.array([float(gj(jax.random.key(100 + k)))
                         for k in range(N_KEYS)])
        out[f"depths_0_to_{nd - 1}"] = {
            "pair_net_mean": float(vals.mean()),
            "se": float(vals.std(ddof=1) / np.sqrt(N_KEYS)),
            "n": N_KEYS,
        }
        print(f"depths 0..{nd - 1}: pair net {vals.mean():+.3f} +- "
              f"{out[f'depths_0_to_{nd - 1}']['se']:.3f}",
              file=sys.stderr, flush=True)

    rec = {
        "metric": "rim_delta_lobe_pair_net_vs_vertex_depth_coverage",
        "config": "glass-on-black rim zoom, d(loss)/d(radius); pair "
                  "truth ~= FD_total - boundary ~= -0.01 "
                  "(docs/RIM_OWNERSHIP_r05.json)",
        "arms": out,
        "device": jax.devices()[0].platform,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "RIM_DEPTH_r05.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
