"""Two-stage adaptive sampling (raytracinginoneweekend_tpu.adaptive)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekend_tpu.adaptive import render_adaptive
from raytracinginoneweekend_tpu.config import DEFAULT
from raytracinginoneweekend_tpu.models.camera import (make_camera,
                                                      reference_cuda_camera)
from raytracinginoneweekend_tpu.models.scene import simple_scene_cuda
from raytracinginoneweekend_tpu.ops.integrate_planar import (
    render_pixels_planar)

W, H = 32, 18


def _wide_cam(w=W, h=H):
    return make_camera((-4, 3.2, 5), (0, 1, 0), (0, 1, 0), w / h, 42.0,
                       0.5, float(np.linalg.norm((-4, 2.2, 5))))


def test_sample_offset_windows_compose():
    """Rendering [0, s) as two offset windows must average to the single
    [0, 2s) call (same per-sample radiance; only the reduction tree
    differs -> f32-tight)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(4)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    kw = dict(width=W, height=H, max_depth=6, camera_mode="thinlens",
              options=DEFAULT)
    a = render_pixels_planar(scene, cam, ids, key, spp=4,
                             sample_offset=0, **kw)
    b = render_pixels_planar(scene, cam, ids, key, spp=4,
                             sample_offset=4, **kw)
    both = render_pixels_planar(scene, cam, ids, key, spp=8, **kw)
    np.testing.assert_allclose(np.asarray((a + b) / 2), np.asarray(both),
                               rtol=1e-6, atol=1e-7)


def test_sample_offset_beyond_strata_rejected():
    """A stratified window past the strata set has no defined strata --
    must raise (pass spp_strata to place the window inside a larger
    pattern, or iid)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    ids = jnp.arange(64, dtype=jnp.int32)
    strat = dataclasses.replace(DEFAULT, sampling="stratified")
    with pytest.raises(ValueError, match="iid"):
        render_pixels_planar(scene, cam, ids, jax.random.key(0), spp=2,
                             sample_offset=2, width=W, height=H,
                             max_depth=3, camera_mode="thinlens",
                             options=strat)


def test_stratified_halves_compose():
    """Round 4: stratified half-windows [0, h) and [h, 2h) against
    spp_strata=2h must average to the single full stratified render --
    the strata derive from absolute sid / spp_strata, so the union IS
    the complete pattern (f32-tight; only the reduction tree differs).
    This is what lets adaptive stage 1 keep stratification."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(4)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    strat = dataclasses.replace(DEFAULT, sampling="stratified")
    kw = dict(width=W, height=H, max_depth=6, camera_mode="thinlens",
              options=strat)
    a = render_pixels_planar(scene, cam, ids, key, spp=4,
                             sample_offset=0, spp_strata=8, **kw)
    b = render_pixels_planar(scene, cam, ids, key, spp=4,
                             sample_offset=4, spp_strata=8, **kw)
    both = render_pixels_planar(scene, cam, ids, key, spp=8, **kw)
    np.testing.assert_allclose(np.asarray((a + b) / 2), np.asarray(both),
                               rtol=1e-6, atol=1e-7)


def test_tiny_batch_tiers_clamped_and_stats_honest():
    """A 1-pixel batch: tiers clamp to the pixels available (no empty
    stage-2 renders) and the returned stats account exactly the rays
    actually rendered."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    ids = jnp.arange(1, dtype=jnp.int32)
    out, stats = render_adaptive(
        scene, cam, jax.random.key(0), width=W, height=H, spp_base=4,
        max_depth=3, camera_mode="thinlens", options=DEFAULT,
        pixel_ids=ids, return_stats=True)
    assert out.shape == (1, 3)
    assert sum(n for n, _ in stats["tiers"]) <= 1  # clamped to p
    extra = sum(n * e for n, e in stats["tiers"])
    assert stats["rays_stage2"] == extra
    assert stats["avg_spp"] == (1 * 4 + extra) / 1


def test_adaptive_allocates_to_noise_and_stays_unbiased():
    """(a) stage-2 samples land on the measurably noisiest pixels (the
    defocus blur region under a wide aperture, not the flat sky);
    (b) the global mean matches uniform sampling at matched spp within
    MC noise (the adaptive combination's allocation bias is below
    noise); (c) at EQUAL average budget the adaptive image has lower
    MSE vs a converged reference than the uniform render."""
    scene = simple_scene_cuda()
    cam = _wide_cam()
    ids = jnp.arange(W * H, dtype=jnp.int32)
    kw = dict(width=W, height=H, max_depth=6, camera_mode="thinlens",
              options=DEFAULT)

    # Converged reference for MSE (256 spp, planar).
    truth = np.asarray(render_pixels_planar(
        scene, cam, ids, jax.random.key(999), spp=256, **kw))

    n_keys = 6
    mse_ad, mse_un, means_ad, means_un = [], [], [], []
    for k in range(n_keys):
        key = jax.random.key(10 + k)
        img_ad, stats = render_adaptive(
            scene, cam, key, spp_base=8, return_stats=True,
            width=W, height=H, max_depth=6, camera_mode="thinlens",
            options=DEFAULT)
        # matched uniform budget: ceil(avg_spp) rounds AGAINST adaptive
        spp_match = int(np.ceil(stats["avg_spp"]))
        img_un = render_pixels_planar(scene, cam, ids, key,
                                      spp=spp_match, **kw)
        img_ad, img_un = np.asarray(img_ad), np.asarray(img_un)
        mse_ad.append(((img_ad - truth) ** 2).mean())
        mse_un.append(((img_un - truth) ** 2).mean())
        means_ad.append(img_ad.mean())
        means_un.append(img_un.mean())

    # (b) unbiased within noise.
    se = np.std(means_un, ddof=1) / np.sqrt(n_keys)
    assert abs(np.mean(means_ad) - np.mean(means_un)) < 6 * max(se, 1e-4)
    # (c) equal-budget MSE strictly better on this noise-concentrated
    # config (measured ~0.7x; bound loose vs key noise).
    assert np.mean(mse_ad) < 0.9 * np.mean(mse_un), (
        np.mean(mse_ad), np.mean(mse_un))

    # (d) the stratified composition runs, stays unbiased within noise,
    # and does not lose to adaptive-iid on this concentrated-noise
    # config (measured grid: ad+strat 0.46x vs uniform-iid, the best
    # arm; bound loose vs key noise).
    strat = dataclasses.replace(DEFAULT, sampling="stratified")
    mse_ast, means_ast = [], []
    for k in range(n_keys):
        img_ast = np.asarray(render_adaptive(
            scene, cam, jax.random.key(10 + k), spp_base=8,
            width=W, height=H, max_depth=6, camera_mode="thinlens",
            options=strat))
        mse_ast.append(((img_ast - truth) ** 2).mean())
        means_ast.append(img_ast.mean())
    assert abs(np.mean(means_ast) - np.mean(means_un)) < 6 * max(se, 1e-4)
    assert np.mean(mse_ast) < 1.1 * np.mean(mse_ad), (
        np.mean(mse_ast), np.mean(mse_ad))

    # (a) allocation sanity: rerun stage 1 to find where tier-1 landed;
    # the noisiest-16th pixels' scores must dominate the flat-sky
    # median score by a wide margin.
    key = jax.random.key(10)
    m_a = render_pixels_planar(scene, cam, ids, key, spp=4,
                               sample_offset=0, **kw)
    m_b = render_pixels_planar(scene, cam, ids, key, spp=4,
                               sample_offset=4, **kw)
    score = np.asarray(jnp.abs(m_a - m_b).sum(-1))
    top = np.sort(score)[-len(score) // 16:]
    assert top.mean() > 5 * np.median(score)
