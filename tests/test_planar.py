"""Planar-AD engine (ops/integrate_planar.py) vs the tiled engine.

The planar engine re-expresses the tiled scan integrator in (R, 128)
planes with the Pallas closest-hit under a custom VJP; the RNG contract is
identical (nested-vmap of ops/rng.py), so radiance must agree to f32
reassociation and gradients to the same tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekend_tpu.config import (DEFAULT, REFERENCE_CUDA,
                                               RenderConfig)
from raytracinginoneweekend_tpu.models.camera import reference_cuda_camera
from raytracinginoneweekend_tpu.models.scene import (huge_scene,
                                                     simple_scene_cuda)
from raytracinginoneweekend_tpu.ops.integrate_planar import (
    render_pixels_planar)
from raytracinginoneweekend_tpu.optim import fit, render_loss
from raytracinginoneweekend_tpu.render import render, render_pixels

W, H, SPP, DEPTH = 24, 16, 4, 6


@pytest.mark.parametrize("mode,opts", [
    ("thinlens", DEFAULT),
    ("cuda", REFERENCE_CUDA),
    ("cpu", DEFAULT),
    ("pinhole", DEFAULT),
])
def test_planar_matches_tiled_radiance(mode, opts):
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(7)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    a = np.asarray(render_pixels(scene, cam, ids, key, width=W, height=H,
                                 spp=SPP, wave_spp=SPP, max_depth=DEPTH,
                                 camera_mode=mode, options=opts))
    b = np.asarray(render_pixels_planar(scene, cam, ids, key, width=W,
                                        height=H, spp=SPP, max_depth=DEPTH,
                                        camera_mode=mode, options=opts))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


@pytest.mark.slow
def test_planar_matches_tiled_huge_scene():
    """Sphere padding (489 -> UNROLL multiple) + streaming parity."""
    scene = huge_scene(0)
    cam = reference_cuda_camera(16, 8)
    key = jax.random.key(2)
    ids = jnp.arange(16 * 8, dtype=jnp.int32)
    a = np.asarray(render_pixels(scene, cam, ids, key, width=16, height=8,
                                 spp=2, wave_spp=2, max_depth=4,
                                 camera_mode="thinlens", options=DEFAULT))
    b = np.asarray(render_pixels_planar(scene, cam, ids, key, width=16,
                                        height=8, spp=2, max_depth=4,
                                        camera_mode="thinlens",
                                        options=DEFAULT))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-4)


def test_planar_gradients_match_tiled():
    """value_and_grad through both engines agrees for every leaf type
    (the custom VJP + one-hot table transpose vs the tiled formulation)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(7)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    params = {"albedo": scene.albedo, "centers": scene.centers,
              "radii": scene.radii, "fuzz": scene.fuzz, "ior": scene.ior}

    def loss(p, engine):
        return render_loss(p, scene, cam, target, ids, key, width=W,
                           height=H, spp=2, max_depth=3,
                           camera_mode="pinhole", options=DEFAULT,
                           engine=engine)

    lt, gt = jax.value_and_grad(lambda p: loss(p, "tiled"))(params)
    lp, gp = jax.value_and_grad(lambda p: loss(p, "planar"))(params)
    np.testing.assert_allclose(float(lt), float(lp), rtol=1e-5)
    for name in params:
        a, b = np.asarray(gt[name]), np.asarray(gp[name])
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6,
                                   err_msg=name)


def test_planar_ragged_batch_padding():
    """A pixel count that does not fill the (rows*128) layout must pad and
    mask correctly (every pixel equals the tiled engine's value)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(1)
    ids = jnp.arange(37, dtype=jnp.int32) * 7 % (W * H)
    a = np.asarray(render_pixels(scene, cam, ids, key, width=W, height=H,
                                 spp=3, wave_spp=3, max_depth=3,
                                 camera_mode="thinlens", options=DEFAULT))
    b = np.asarray(render_pixels_planar(scene, cam, ids, key, width=W,
                                        height=H, spp=3, max_depth=3,
                                        camera_mode="thinlens",
                                        options=DEFAULT))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_fit_planar_default_converges_and_matches_tiled():
    """fit() (planar default) matches an explicit engine='tiled' run on
    the same batches to float tolerance."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    cfg = RenderConfig(width=W, height=H, spp=4, max_depth=4,
                       camera_mode="pinhole", options=DEFAULT)
    target = render(scene, cam, cfg, jax.random.key(0))
    bad = scene._replace(
        albedo=scene.albedo.at[0].set(jnp.array([0.9, 0.9, 0.9])))
    _, p_planar, _, l_planar = fit(
        bad, cam, target, cfg, which=("albedo",), steps=4,
        learning_rate=5e-2, batch_pixels=64, spp=2)
    _, p_tiled, _, l_tiled = fit(
        bad, cam, target, cfg, which=("albedo",), steps=4,
        learning_rate=5e-2, batch_pixels=64, spp=2, engine="tiled")
    np.testing.assert_allclose(np.asarray(p_planar["albedo"]),
                               np.asarray(p_tiled["albedo"]), rtol=1e-3,
                               atol=1e-5)
