#!/usr/bin/env python
"""Benchmark the differentiable (inverse-rendering) train step on TPU.

Two tiers:

* SMALL (the round-2/3 artifact, kept for continuity): simple CUDA scene
  at 4096 batch pixels x 8 spp depth 8, interior vs full-surrogate arms.

* FLAGSHIP (VERDICT r3 item 1): the gradient path at the forward
  headline's own scale -- huge scene, 1200x800 camera, depth 50,
  16384 batch pixels x 8 spp (131072 rays/step) -- recording
  gradient-path rays/s for BOTH reverse-mode engines:
    - planar:    fixed-depth scan (ops/integrate_planar.py) -- every
      bounce processes every lane for all 50 bounces (~93% dead lanes
      at the measured ~3.4 segments/ray);
    - wavefront: the regenerative differentiable pool
      (ops/wavefront_ad.py) -- dead lanes hand their slot to the next
      ray, epochs skip once drained.
  Plus the forward-only wavefront number on the same workload, so the
  artifact states the gradient-path/forward ratio directly.

Prints one JSON line; the round driver / operator redirects it to
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
from raytracinginoneweekend_tpu.models.camera import (reference_cpu_camera,
                                                      reference_cuda_camera)
from raytracinginoneweekend_tpu.models.scene import (huge_scene,
                                                     simple_scene_cuda)
from raytracinginoneweekend_tpu.optim.inverse import (make_train_step,
                                                      params_from_scene)
from raytracinginoneweekend_tpu.utils.compilecache import (
    enable_persistent_cache)
from raytracinginoneweekend_tpu.utils.timing import time_fn

W, H, SPP, DEPTH = 320, 180, 8, 8
BATCH = 4096
STEPS_PER_CALL = 20  # amortize dispatch: scan the step inside one jit

FLAG_W, FLAG_H, FLAG_SPP, FLAG_DEPTH = 1200, 800, 8, 50
FLAG_BATCH = 16384


def arm(scene, cam, target, pixel_ids, label, *, width, height, spp,
        depth, camera_mode, steps_per_call=STEPS_PER_CALL, iters=3,
        options=DEFAULT, return_params=False, **terms):
    opt = optax.adam(1e-2)
    params = params_from_scene(scene)
    opt_state = opt.init(params)
    step = make_train_step(opt, width=width, height=height, spp=spp,
                           max_depth=depth, camera_mode=camera_mode,
                           options=options, **terms)

    def many(params, opt_state):
        def body(c, k):
            p, s = c
            p, s, loss = step(p, s, scene, cam, target, pixel_ids,
                              jax.random.fold_in(jax.random.key(1), k))
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps_per_call))
        return params, opt_state, losses

    many_j = jax.jit(many)
    sec, (p_end, _, losses) = time_fn(lambda: many_j(params, opt_state),
                                      warmup=1, iters=iters)
    assert bool(jnp.isfinite(losses).all())
    rays = pixel_ids.shape[0] * spp
    ms = sec / steps_per_call * 1e3
    rec = {"label": label, "ms_per_step": ms,
           "steps_per_s": steps_per_call / sec,
           "grad_rays_per_s": rays / (ms / 1e3)}
    return (rec, p_end) if return_params else rec


FLAG_POOL = 8192  # measured best on v5e (W=16 waves amortizes stragglers)


def flagship():
    """Gradient path at forward-headline scale (VERDICT r3 item 1).

    NOTE on dispatch overhead: the axon tunnel costs ~50 ms per jit CALL
    (measured: a (256,128) x+1 jit is 50.7 ms/call), so every arm scans
    STEPS_PER_CALL steps inside ONE jit -- residual inflation is
    ~50/STEPS_PER_CALL ms per step and is reported for transparency.
    """
    from raytracinginoneweekend_tpu.ops.wavefront_ad import (
        EPOCH_LEN, render_pixels_wavefront_ad, wavefront_ad_budget,
        wavefront_ad_done)

    scene = huge_scene(seed=0)
    cam = reference_cpu_camera(FLAG_W, FLAG_H)
    pixel_ids = jax.random.choice(
        jax.random.key(3), FLAG_W * FLAG_H, (FLAG_BATCH,),
        replace=False).astype(jnp.int32)
    target = jnp.zeros((FLAG_BATCH, 3), jnp.float32) + 0.25
    kw = dict(width=FLAG_W, height=FLAG_H, spp=FLAG_SPP, depth=FLAG_DEPTH,
              camera_mode="thinlens", iters=2)

    # Iteration budget: measured exactly on one key (one guaranteed
    # worst-case forward), padded by two epochs, then VALIDATED on every
    # step key the arms will actually run (same compiled validator, keys
    # are traced -- cheap calls).
    n_waves = -(-FLAG_BATCH * FLAG_SPP // FLAG_POOL)
    step_keys = [jax.random.fold_in(jax.random.key(1), k)
                 for k in range(STEPS_PER_CALL)]

    def budget_for(options):
        probe_kw = dict(width=FLAG_W, height=FLAG_H, spp=FLAG_SPP,
                        max_depth=FLAG_DEPTH, camera_mode="thinlens",
                        options=options, pool_size=FLAG_POOL)
        budget = wavefront_ad_budget(scene, cam, pixel_ids,
                                     jax.random.key(1),
                                     **probe_kw) + 2 * EPOCH_LEN
        while budget < n_waves * FLAG_DEPTH and not all(
                bool(wavefront_ad_done(scene, cam, pixel_ids, sk,
                                       iters=budget, **probe_kw))
                for sk in step_keys):
            budget += 2 * EPOCH_LEN
        return min(budget, n_waves * FLAG_DEPTH)

    budget = budget_for(DEFAULT)
    wf_opts = dict(pool_size=FLAG_POOL, iters=budget, remat="auto")

    def check_end_budget(options, budget_n, p_end):
        """The 20 timed steps DRIFT the params (adam toward the target),
        and drain length tracks the params -- for rr arms continuously
        (survival q = f(attenuation = f(albedo))). A budget validated
        only at the initial scene could silently truncate late-step
        rays (dropped as black, finite losses). Re-validate at the
        POST-TRAINING params on every step key; raise loudly if short."""
        from raytracinginoneweekend_tpu.optim.inverse import (
            scene_with_params)

        s_end = scene_with_params(scene, jax.tree.map(
            jax.lax.stop_gradient, p_end))
        probe_kw = dict(width=FLAG_W, height=FLAG_H, spp=FLAG_SPP,
                        max_depth=FLAG_DEPTH, camera_mode="thinlens",
                        options=options, pool_size=FLAG_POOL)
        assert all(
            bool(wavefront_ad_done(s_end, cam, pixel_ids, sk,
                                   iters=budget_n, **probe_kw))
            for sk in step_keys), (
            f"budget {budget_n} too small at the trained params -- "
            f"the timed trajectory truncated rays")

    wavefront, p_end = arm(
        scene, cam, target, pixel_ids, "wavefront_regen",
        engine="wavefront", engine_opts=wf_opts, return_params=True, **kw)
    check_end_budget(DEFAULT, budget, p_end)

    # Estimator-toolbox arms (round 4): rr_terminate in the AD path
    # kills dead-weight continuations so the pool drains in FEWER
    # iterations (budget re-probed under the rr options); + stratified
    # sampling for the gradient-variance win (docs/STRAT_GRAD_r04.json).
    import dataclasses

    rr_opts = dataclasses.replace(DEFAULT, rr_terminate=True)
    budget_rr = budget_for(rr_opts)
    wavefront_rr, p_end_rr = arm(
        scene, cam, target, pixel_ids, "wavefront_regen_rr",
        engine="wavefront", options=rr_opts, return_params=True,
        engine_opts=dict(pool_size=FLAG_POOL, iters=budget_rr,
                         remat="auto"), **kw)
    check_end_budget(rr_opts, budget_rr, p_end_rr)
    tb_opts = dataclasses.replace(rr_opts, sampling="stratified")
    budget_tb = budget_for(tb_opts)
    wavefront_toolbox, p_end_tb = arm(
        scene, cam, target, pixel_ids, "wavefront_regen_rr_stratified",
        engine="wavefront", options=tb_opts, return_params=True,
        engine_opts=dict(pool_size=FLAG_POOL, iters=budget_tb,
                         remat="auto"), **kw)
    check_end_budget(tb_opts, budget_tb, p_end_tb)
    wavefront_safe = arm(scene, cam, target, pixel_ids,
                         "wavefront_regen_worstcase_budget",
                         engine="wavefront",
                         engine_opts=dict(pool_size=FLAG_POOL), **kw)
    planar = arm(scene, cam, target, pixel_ids, "planar_fixed_depth",
                 engine="planar", **kw)

    # FULL gradient machinery at flagship scale (VERDICT r4 #2): the
    # boundary + secondary + rr_grad surrogates -- the terms that make
    # ior and silhouette gradients correct (re-expressing the visibility
    # discontinuities of raytracer.hxx:120-199 / main.cxx:52-75) -- on
    # the SAME huge/d50/131k-ray workload, added CUMULATIVELY so each
    # term's marginal ms/step is its own two-point phase share
    # (boundary = b - interior, secondary = bs - b, rr = full - bs).
    # Same sample counts as the small tier's "full" arm.
    sur_b = dict(boundary_samples=512)
    sur_bs = dict(boundary_samples=512, secondary_samples=4,
                  secondary_vertex_depths=2)
    sur_full = dict(boundary_samples=512, secondary_samples=4,
                    secondary_vertex_depths=2, rr_grad=True)

    def arm_auto_budget(label, terms):
        """Surrogate gradients move GEOMETRY, so the post-training drain
        length can exceed the interior arm's validated budget (observed:
        192 too small after 20 boundary-term steps). Bump by whole
        epochs and re-time until the end-of-trajectory validation
        passes; worst case is exact-complete."""
        b = budget
        while True:
            opts_b = dict(pool_size=FLAG_POOL, iters=b, remat="auto")
            rec, p_end = arm(scene, cam, target, pixel_ids, label,
                             engine="wavefront", engine_opts=opts_b,
                             return_params=True, **terms, **kw)
            try:
                check_end_budget(DEFAULT, b, p_end)
            except AssertionError:
                if b >= n_waves * FLAG_DEPTH:
                    raise
                b = min(b + 4 * EPOCH_LEN, n_waves * FLAG_DEPTH)
                continue
            rec["iters_budget"] = b
            return rec

    wf_b = arm_auto_budget("wavefront_boundary", sur_b)
    wf_bs = arm_auto_budget("wavefront_boundary_secondary", sur_bs)
    wf_full = arm_auto_budget("wavefront_full_surrogate", sur_full)
    base_ms = wavefront["ms_per_step"]
    full_ms = wf_full["ms_per_step"]
    phase_ms = {
        "interior": base_ms,
        "boundary": wf_b["ms_per_step"] - base_ms,
        "secondary": wf_bs["ms_per_step"] - wf_b["ms_per_step"],
        "rr_grad": full_ms - wf_bs["ms_per_step"],
    }
    full_surrogate = {
        "samples": sur_full,
        "arms": {"boundary": wf_b, "boundary_secondary": wf_bs,
                 "full": wf_full},
        "phase_ms": phase_ms,
        "phase_share": {k: v / full_ms for k, v in phase_ms.items()},
        "full_to_interior_ratio": full_ms / base_ms,
    }

    # Forward-only floor on the same workload (same pool/budget), scanned
    # like the arms so the tunnel dispatch cost amortizes identically.
    def fwd_many():
        def body(c, k):
            img = render_pixels_wavefront_ad(
                scene, cam, pixel_ids, jax.random.fold_in(
                    jax.random.key(1), k), width=FLAG_W, height=FLAG_H,
                spp=FLAG_SPP, max_depth=FLAG_DEPTH,
                camera_mode="thinlens", options=DEFAULT, **wf_opts)
            return c + img.mean(), None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(STEPS_PER_CALL))[0]

    fwd_j = jax.jit(fwd_many)
    fsec, _ = time_fn(fwd_j, warmup=1, iters=2)
    fwd_ms = fsec / STEPS_PER_CALL * 1e3
    rays = FLAG_BATCH * FLAG_SPP
    return {
        "metric": "train_step_huge_1200x800cam_16384px_8spp_d50",
        "rays_per_step": rays,
        "pool_lanes": FLAG_POOL,
        "iters_budget": budget,
        "iters_budget_rr": budget_rr,
        "iters_budget_toolbox": budget_tb,
        "iters_worst_case": n_waves * FLAG_DEPTH,
        "dispatch_overhead_ms_per_step": 50.0 / STEPS_PER_CALL,
        "wavefront": wavefront,
        "wavefront_rr": wavefront_rr,
        "wavefront_rr_stratified": wavefront_toolbox,
        "wavefront_worstcase_budget": wavefront_safe,
        "planar": planar,
        "full_surrogate": full_surrogate,
        "forward_only_ms": fwd_ms,
        "forward_only_rays_per_s": rays / (fwd_ms / 1e3),
        "grad_to_forward_ratio": wavefront["ms_per_step"] / fwd_ms,
        "full_surrogate_to_forward_ratio": full_ms / fwd_ms,
        "speedup_vs_fixed_depth": (wavefront["grad_rays_per_s"]
                                   / planar["grad_rays_per_s"]),
    }


def main() -> None:
    enable_persistent_cache()
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    pixel_ids = jax.random.choice(jax.random.key(3), W * H, (BATCH,),
                                  replace=False).astype(jnp.int32)
    target = jnp.zeros((BATCH, 3), jnp.float32) + 0.25
    kw = dict(width=W, height=H, spp=SPP, depth=DEPTH, camera_mode="cuda")

    interior = arm(scene, cam, target, pixel_ids, "interior", **kw)
    full = arm(scene, cam, target, pixel_ids, "full",
               boundary_samples=512, secondary_samples=4,
               secondary_vertex_depths=2, rr_grad=True, **kw)
    rec = {
        "metric": "train_step_simple_4096px_8spp_d8",
        "rays_per_step": BATCH * SPP,
        "interior": interior,
        "full": full,
        "flagship": flagship(),
        "device": str(jax.devices()[0].platform),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
