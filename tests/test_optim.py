"""Inverse rendering (BASELINE config 5) + checkpoint/resume tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytracinginoneweekend_tpu.config import DEFAULT, RenderConfig
from raytracinginoneweekend_tpu.models.camera import reference_cuda_camera
from raytracinginoneweekend_tpu.models.scene import simple_scene_cuda
from raytracinginoneweekend_tpu.optim import (fit, load_checkpoint,
                                              params_from_scene,
                                              render_loss, save_checkpoint,
                                              scene_with_params)
from raytracinginoneweekend_tpu.render import render

W, H = 24, 16
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=4,
                   camera_mode="pinhole", options=DEFAULT)


def test_grad_albedo_matches_finite_differences():
    """Pixel-loss gradient w.r.t. albedo vs central finite differences."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(11)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    kwargs = dict(width=W, height=H, spp=2, max_depth=3,
                  camera_mode="pinhole", options=DEFAULT)

    def loss_of_albedo(albedo):
        return render_loss({"albedo": albedo}, scene, cam, target, ids, key,
                           **kwargs)

    g = jax.grad(loss_of_albedo)(scene.albedo)
    # Finite differences on the red channel of material 0 (the center
    # lambert sphere -- definitely visible).
    eps = 1e-3
    up = scene.albedo.at[0, 0].add(eps)
    dn = scene.albedo.at[0, 0].add(-eps)
    fd = (loss_of_albedo(up) - loss_of_albedo(dn)) / (2 * eps)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=2e-2)


def test_fit_recovers_albedo():
    """Perturb material-0 albedo; fit() should move it back toward truth."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    target = render(scene, cam, CFG, jax.random.key(0))

    bad = scene._replace(
        albedo=scene.albedo.at[0].set(jnp.array([0.9, 0.9, 0.9])))
    start = params_from_scene(bad, ("albedo",))
    _, params, _, losses = fit(
        bad, cam, target, CFG, which=("albedo",), steps=30,
        learning_rate=5e-2, batch_pixels=W * H, spp=4)
    assert losses[-1] < losses[0] * 0.5
    err0 = float(jnp.abs(start["albedo"][0] - scene.albedo[0]).sum())
    err1 = float(jnp.abs(params["albedo"][0] - scene.albedo[0]).sum())
    assert err1 < err0 * 0.5


def test_checkpoint_roundtrip(tmp_path):
    scene = simple_scene_cuda()
    params = params_from_scene(scene)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, params, opt_state, step=17)

    # Templates with the right structure but zeroed leaves.
    tmpl_p = jax.tree.map(jnp.zeros_like, params)
    tmpl_o = jax.tree.map(jnp.zeros_like, opt_state)
    p2, o2, step = load_checkpoint(path, tmpl_p, tmpl_o)
    assert step == 17
    for name in params:
        np.testing.assert_array_equal(np.asarray(params[name]),
                                      np.asarray(p2[name]))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    scene = simple_scene_cuda()
    params = params_from_scene(scene, ("albedo",))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, params, opt_state, step=0)
    bad_tmpl = {"albedo": jnp.zeros((2, 3))}
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, bad_tmpl, opt.init(bad_tmpl))


def test_checkpoint_dtype_mismatch_raises(tmp_path):
    """A checkpoint must not silently restore leaves of the wrong dtype
    (e.g. f64 arrays into an f32 param tree)."""
    scene = simple_scene_cuda()
    params = params_from_scene(scene, ("albedo",))
    opt = optax.adam(1e-2)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, params, opt.init(params), step=0)
    bad_tmpl = {"albedo": np.zeros(scene.albedo.shape, np.float64)}
    with pytest.raises(ValueError, match="dtype"):
        load_checkpoint(path, bad_tmpl, opt.init(bad_tmpl))


def test_fit_batch_larger_than_image():
    """batch_pixels > width*height must clamp, not raise (small CLI fits)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(8, 6)
    cfg = RenderConfig(width=8, height=6, spp=1, max_depth=2,
                       camera_mode="pinhole", options=DEFAULT)
    target = render(scene, cam, cfg, jax.random.key(0))
    _, params, _, losses = fit(
        scene, cam, target, cfg, which=("albedo",), steps=1,
        learning_rate=1e-2, batch_pixels=4096, spp=1)
    assert np.isfinite(losses[0])


def test_fit_resume_from_checkpoint(tmp_path):
    """fit -> checkpoint -> resume must continue, not restart."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    target = render(scene, cam, CFG, jax.random.key(0))
    bad = scene._replace(
        albedo=scene.albedo.at[0].set(jnp.array([0.9, 0.9, 0.9])))

    _, params, opt_state, losses = fit(
        bad, cam, target, CFG, which=("albedo",), steps=5,
        learning_rate=5e-2, batch_pixels=W * H, spp=2)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, params, opt_state, step=5)

    opt = optax.adam(5e-2)
    tmpl_p = jax.tree.map(jnp.zeros_like, params)
    p2, o2, step = load_checkpoint(path, tmpl_p, opt.init(tmpl_p))
    assert step == 5
    _, params2, _, losses2 = fit(
        bad, cam, target, CFG, which=("albedo",), steps=5,
        learning_rate=5e-2, batch_pixels=W * H, spp=2,
        init_params=p2, init_opt_state=o2, start_step=step)
    # Same pixel batches as a straight 10-step run (step index keys the
    # batch), so resuming is exactly equivalent to not stopping.
    _, params10, _, losses10 = fit(
        bad, cam, target, CFG, which=("albedo",), steps=10,
        learning_rate=5e-2, batch_pixels=W * H, spp=2)
    np.testing.assert_allclose(np.asarray(params2["albedo"]),
                               np.asarray(params10["albedo"]), rtol=1e-5,
                               atol=1e-7)


@pytest.mark.parametrize("leaf,index,eps", [
    ("albedo", (3, 1), 1e-3),    # ground green channel
    ("fuzz", (1,), 1e-3),        # metal roughness
])
def test_grad_smooth_leaves_match_finite_differences(leaf, index, eps):
    """Shading parameters (albedo, fuzz) enter the radiance smoothly, so AD
    must match central finite differences at fixed RNG (the BASELINE
    pixel-gradient metric)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(13)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.full((W * H, 3), 0.25, jnp.float32)
    kwargs = dict(width=W, height=H, spp=4, max_depth=4,
                  camera_mode="pinhole", options=DEFAULT)

    def loss_of(leaf_value):
        return render_loss({leaf: leaf_value}, scene, cam, target, ids, key,
                           **kwargs)

    base = getattr(scene, leaf)
    g = jax.grad(loss_of)(base)
    assert np.isfinite(np.asarray(g)).all()
    fd = (loss_of(base.at[index].add(eps))
          - loss_of(base.at[index].add(-eps))) / (2 * eps)
    assert np.isclose(float(g[index]), float(fd), rtol=5e-2, atol=5e-5)


def test_grad_geometric_leaves_finite_and_structured():
    """Geometry/branch parameters (centers, radii, ior) have DISCONTINUOUS
    contributions (silhouettes, reflect/refract branch flips at fixed RNG)
    that interior AD alone cannot see; the boundary term is supplied by
    edge sampling (ops/silhouette.py, FD-parity-tested in
    tests/test_silhouette.py). This test covers the INTERIOR half on the
    full simple scene: gradients are finite, flow to every leaf, and the
    dielectric's smooth ior dependence is nonzero."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(13)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.full((W * H, 3), 0.25, jnp.float32)
    kwargs = dict(width=W, height=H, spp=4, max_depth=4,
                  camera_mode="pinhole", options=DEFAULT)

    def loss_of(params):
        return render_loss(params, scene, cam, target, ids, key, **kwargs)

    params = {"centers": scene.centers, "radii": scene.radii,
              "ior": scene.ior}
    g = jax.grad(loss_of)(params)
    for name, leaf in g.items():
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all(), name
        assert np.abs(arr).max() > 0.0, name
    # The dielectric's ior gradient is nonzero (refraction bends smoothly).
    assert abs(float(g["ior"][2])) > 1e-7


def test_fit_with_mesh_psums_gradients():
    """fit(mesh=...) must work end to end on the 8-device CPU mesh and
    agree with the unsharded optimization (same batches, psum'd grads)."""
    from raytracinginoneweekend_tpu.parallel import make_mesh

    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    target = render(scene, cam, CFG, jax.random.key(0))
    bad = scene._replace(
        albedo=scene.albedo.at[0].set(jnp.array([0.9, 0.9, 0.9])))

    _, p_single, _, l_single = fit(
        bad, cam, target, CFG, which=("albedo",), steps=4,
        learning_rate=5e-2, batch_pixels=64, spp=2)
    _, p_mesh, _, l_mesh = fit(
        bad, cam, target, CFG, which=("albedo",), steps=4,
        learning_rate=5e-2, batch_pixels=64, spp=2, mesh=make_mesh())
    np.testing.assert_allclose(np.asarray(p_single["albedo"]),
                               np.asarray(p_mesh["albedo"]), rtol=1e-4,
                               atol=1e-6)


@pytest.mark.slow
def test_mesh_gradients_with_all_boundary_terms():
    """render_loss gradients under the 8-device mesh match the unsharded
    ones with EVERY gradient term enabled (primary + secondary boundary,
    delta-lobe rr): the render shards over pixels, the surrogate terms
    compute replicated -- both paths must agree to float tolerance."""
    from raytracinginoneweekend_tpu.parallel import make_mesh

    w, h = 32, 24
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3), jnp.float32)

    def grad_of(mesh):
        def loss_of(params):
            return render_loss(params, scene, cam, target, ids,
                               jax.random.key(3), width=w, height=h,
                               spp=2, max_depth=4, camera_mode="pinhole",
                               options=DEFAULT, mesh=mesh,
                               boundary_samples=8, secondary_samples=4,
                               secondary_spheres=1,
                               secondary_vertex_depths=2, rr_grad=True)
        return jax.grad(loss_of)(
            {"centers": scene.centers, "radii": scene.radii,
             "ior": scene.ior})

    g1 = grad_of(None)
    g2 = grad_of(make_mesh())
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=2e-4, atol=1e-7)


def test_fit_metal_fuzz_no_nan_regression():
    """Regression: optimizing fuzz once produced NaN gradients -- sqrt's
    backward is inf at exactly 0 (normalize of a near-null lambert bounce,
    the dielectric's k==0 TIR boundary) and inf * masked-0 = NaN leaked
    through the masks, then spread to every material via the one-hot
    gather transpose. The double-where fixes in math3 keep this finite."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    cfg = RenderConfig(width=W, height=H, spp=8, max_depth=8,
                       camera_mode="thinlens", options=DEFAULT)
    target = render(scene, cam, cfg, jax.random.key(0))
    k = jax.random.key(99)
    pert = scene._replace(
        albedo=jnp.clip(scene.albedo
                        + 0.35 * jax.random.normal(k, scene.albedo.shape),
                        0.05, 0.95),
        fuzz=jnp.clip(scene.fuzz + 0.3, 0.0, 1.0))
    _, params, _, losses = fit(
        pert, cam, target, cfg, which=("albedo", "fuzz"), steps=6,
        learning_rate=2e-2, batch_pixels=256, spp=8, base_key=jax.random.key(7))
    for leaf in params.values():
        assert np.isfinite(np.asarray(leaf)).all()
    assert all(np.isfinite(losses))
