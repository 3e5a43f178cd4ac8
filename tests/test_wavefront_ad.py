"""Regenerative differentiable wavefront (ops/wavefront_ad.py).

The engine re-expresses the fixed-depth planar scan with wavefront-style
lane regeneration; radiance must agree with the fixed engine to
instruction-level f32 noise (FMA contraction differs between the two
program contexts), be BIT-invariant to pool_size, and its gradients
must match the fixed engine (f32 reassociation) and finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekend_tpu.config import DEFAULT, REFERENCE_CUDA
from raytracinginoneweekend_tpu.models.camera import reference_cuda_camera
from raytracinginoneweekend_tpu.models.scene import (huge_scene,
                                                     simple_scene_cuda)
from raytracinginoneweekend_tpu.ops.integrate_planar import (
    render_pixels_planar)
from raytracinginoneweekend_tpu.ops.wavefront_ad import (
    render_pixels_wavefront_ad)
from raytracinginoneweekend_tpu.optim import (params_from_scene,
                                              render_loss,
                                              scene_with_params)

W, H, SPP, DEPTH = 24, 16, 4, 6


def _batch(n=256, seed=3):
    return jax.random.choice(jax.random.key(seed), W * H, (n,),
                             replace=False).astype(jnp.int32)


@pytest.mark.parametrize("mode,opts", [
    ("thinlens", DEFAULT),
    ("cuda", REFERENCE_CUDA),
])
def test_matches_fixed_depth_engine(mode, opts):
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(7)
    ids = _batch()
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH,
              camera_mode=mode, options=opts)
    a = np.asarray(render_pixels_planar(scene, cam, ids, key, **kw))
    b = np.asarray(render_pixels_wavefront_ad(scene, cam, ids, key,
                                              pool_size=1024, **kw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_pool_size_bit_invariance():
    """Regeneration schedule must not change any ray's radiance: pools of
    1, 2 and 4 waves produce BITWISE identical pixels."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(5)
    ids = _batch()
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH,
              camera_mode="thinlens", options=DEFAULT)
    imgs = [np.asarray(render_pixels_wavefront_ad(
        scene, cam, ids, key, pool_size=ps, **kw))
        for ps in (256, 512, 1024)]
    assert (imgs[0] == imgs[1]).all()
    assert (imgs[0] == imgs[2]).all()


def test_epoch_len_bit_invariance_and_tight_budget():
    """epoch_len is a pure scheduling knob; a budget covering the actual
    max lane-iteration count equals the guaranteed worst case."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(5)
    ids = _batch()
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH,
              camera_mode="thinlens", options=DEFAULT, pool_size=512)
    a = np.asarray(render_pixels_wavefront_ad(scene, cam, ids, key,
                                              epoch_len=4, **kw))
    b = np.asarray(render_pixels_wavefront_ad(scene, cam, ids, key,
                                              epoch_len=16, **kw))
    assert (a == b).all()


def test_debug_check_complete_smoke():
    """The tuned-budget truncation detector (ADVICE r4): the debug flag
    compiles and leaves pixels bit-identical for both a sufficient and a
    deliberately truncating budget (it only prints; the images are the
    budget's own, dropped rays included -- the documented contract)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(5)
    ids = _batch(64)
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH,
              camera_mode="thinlens", options=DEFAULT, pool_size=256)
    for iters in (2, None):
        if iters is None:
            a = np.asarray(render_pixels_wavefront_ad(
                scene, cam, ids, key, **kw))
            b = a
        else:
            a = np.asarray(render_pixels_wavefront_ad(
                scene, cam, ids, key, iters=iters, **kw))
            b = np.asarray(render_pixels_wavefront_ad(
                scene, cam, ids, key, iters=iters,
                debug_check_complete=True, **kw))
        assert (np.asarray(a) == np.asarray(b)).all()
        assert np.isfinite(a).all()


def test_depth_exhaustion_semantics():
    """max_depth = 1 and 2 (depth-out kills without deposit) match the
    fixed engine exactly at the same tolerance."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(9)
    ids = _batch()
    for depth in (1, 2):
        kw = dict(width=W, height=H, spp=SPP, max_depth=depth,
                  camera_mode="cuda", options=DEFAULT)
        a = np.asarray(render_pixels_planar(scene, cam, ids, key, **kw))
        b = np.asarray(render_pixels_wavefront_ad(scene, cam, ids, key,
                                                  pool_size=512, **kw))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_stratified_sampling_parity():
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(2)
    ids = _batch()
    import dataclasses
    opts = dataclasses.replace(DEFAULT, sampling="stratified")
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH,
              camera_mode="thinlens", options=opts)
    a = np.asarray(render_pixels_planar(scene, cam, ids, key, **kw))
    b = np.asarray(render_pixels_wavefront_ad(scene, cam, ids, key,
                                              pool_size=512, **kw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_tuned_budget_flat_scan_bit_equal():
    """A validated iteration budget (flat scan, both remat modes) is
    bitwise identical to the guaranteed worst-case epoch structure, in
    values AND gradients; the done validator discriminates budgets."""
    from raytracinginoneweekend_tpu.ops.wavefront_ad import (
        render_pixels_wavefront_ad_impl, wavefront_ad_done)

    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(0)
    ids = _batch()
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH,
              camera_mode="cuda", options=DEFAULT, pool_size=512)
    assert not bool(wavefront_ad_done(scene, cam, ids, key, iters=4, **kw))
    assert bool(wavefront_ad_done(scene, cam, ids, key, iters=24, **kw))

    def img_of(p, **extra):
        return render_pixels_wavefront_ad_impl(
            scene._replace(**p), cam, ids, key, **kw, **extra)

    params = {"albedo": scene.albedo}
    base = np.asarray(img_of(params))
    g0 = jax.grad(lambda p: jnp.sum(img_of(p) ** 2))(params)["albedo"]
    for extra in (dict(iters=24, remat="none"), dict(iters=24,
                                                     remat="step")):
        assert (np.asarray(img_of(params, **extra)) == base).all(), extra
        g = jax.grad(lambda p: jnp.sum(img_of(p, **extra) ** 2))(
            params)["albedo"]
        assert (np.asarray(g) == np.asarray(g0)).all(), extra


def test_gradients_match_fixed_engine():
    """Parameter gradients agree with the fixed-depth engine to f32
    reassociation (table-gradient matmuls group lanes by pool iteration
    instead of bounce index)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(4)
    ids = _batch(128)
    target = jnp.zeros((128, 3), jnp.float32) + 0.3
    kw = dict(width=W, height=H, spp=2, max_depth=4,
              camera_mode="cuda", options=DEFAULT)
    params = params_from_scene(scene)

    ga = jax.grad(render_loss)(params, scene, cam, target, ids, key,
                               engine="planar", **kw)
    gb = jax.grad(render_loss)(params, scene, cam, target, ids, key,
                               engine="wavefront", **kw)
    for name in params:
        a, b = np.asarray(ga[name]), np.asarray(gb[name])
        assert np.isfinite(b).all(), name
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=name)


def test_grad_albedo_matches_finite_differences():
    """Direct FD validation of the regenerative engine's gradient."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(11)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    kw = dict(width=W, height=H, spp=2, max_depth=3,
              camera_mode="pinhole", options=DEFAULT, engine="wavefront")

    def loss_of_albedo(albedo):
        return render_loss({"albedo": albedo}, scene, cam, target, ids,
                           key, **kw)

    g = jax.grad(loss_of_albedo)(scene.albedo)
    eps = 1e-3
    up = scene.albedo.at[0, 0].add(eps)
    dn = scene.albedo.at[0, 0].add(-eps)
    fd = (loss_of_albedo(up) - loss_of_albedo(dn)) / (2 * eps)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=2e-2)


def test_rr_terminate_parity_across_ad_and_forward_engines():
    """rr_terminate in the AD engines (fixed-depth planar scan + the
    regenerative pool) consumes the SAME (TAG_BOUNCE + b, counter 2)
    draw and q/boost arithmetic as the forward wavefront engine, so all
    three agree to accumulation order -- and the termination actually
    fires (fewer traced segments than rr-off)."""
    import dataclasses

    from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront

    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(3)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    opts = dataclasses.replace(DEFAULT, rr_terminate=True, rr_start=2,
                               rr_scale=1.0)
    kw = dict(width=W, height=H, spp=SPP, max_depth=8,
              camera_mode="thinlens", options=opts)
    fwd = np.asarray(render_wavefront(scene, cam, key, pool_size=512,
                                      **kw))
    a = np.asarray(render_pixels_planar(scene, cam, ids, key, **kw))
    b = np.asarray(render_pixels_wavefront_ad(scene, cam, ids, key,
                                              pool_size=512, **kw))
    np.testing.assert_allclose(a, fwd, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=2e-5)
    _, s_rr = render_wavefront(scene, cam, key, return_stats=True,
                               pool_size=512, **kw)
    _, s_off = render_wavefront(scene, cam, key, return_stats=True,
                                pool_size=512,
                                **{**kw, "options": DEFAULT})
    assert int(s_rr["segments"]) < int(s_off["segments"])


def test_rr_terminate_gradients():
    """Gradients under rr_terminate: both AD engines agree to f32
    reassociation (the stop-gradiented survival weights are identical),
    stay finite, and the regenerative engine's albedo gradient matches
    finite differences of the rr-on estimator itself."""
    import dataclasses

    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(11)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    opts = dataclasses.replace(DEFAULT, rr_terminate=True, rr_start=2,
                               rr_scale=1.0)
    kw = dict(width=W, height=H, spp=2, max_depth=4,
              camera_mode="pinhole", options=opts)
    params = params_from_scene(scene, ("albedo", "centers"))
    ga = jax.grad(render_loss)(params, scene, cam, target, ids, key,
                               engine="planar", **kw)
    gb = jax.grad(render_loss)(params, scene, cam, target, ids, key,
                               engine="wavefront", **kw)
    for name in params:
        a, b = np.asarray(ga[name]), np.asarray(gb[name])
        assert np.isfinite(b).all(), name
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=name)

    def loss_of_albedo(albedo):
        return render_loss({"albedo": albedo}, scene, cam, target, ids,
                           key, engine="wavefront", **kw)

    g = jax.grad(loss_of_albedo)(scene.albedo)
    eps = 1e-3
    fd = (loss_of_albedo(scene.albedo.at[0, 0].add(eps))
          - loss_of_albedo(scene.albedo.at[0, 0].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=2e-2)


@pytest.mark.slow
def test_huge_scene_parity():
    scene = huge_scene(0)
    cam = reference_cuda_camera(16, 8)
    key = jax.random.key(2)
    ids = jnp.arange(16 * 8, dtype=jnp.int32)
    kw = dict(width=16, height=8, spp=2, max_depth=4,
              camera_mode="thinlens", options=DEFAULT)
    a = np.asarray(render_pixels_planar(scene, cam, ids, key, **kw))
    b = np.asarray(render_pixels_wavefront_ad(scene, cam, ids, key,
                                              pool_size=128, **kw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_ad_engine_auto_policy():
    """--ad-engine auto resolves by the measured depth crossover
    (docs/AD_DEPTH_SWEEP_r04.json): planar at depth <= 32, the
    regenerative wavefront pool above. Both resolutions must run and
    agree with their explicitly-selected engine bit-exactly (auto is
    pure dispatch, no numeric change)."""
    from raytracinginoneweekend_tpu.optim.inverse import (
        AD_ENGINE_AUTO_DEPTH, resolve_ad_engine)

    from raytracinginoneweekend_tpu.optim.inverse import (
        AD_ENGINE_AUTO_DEPTH_RR)

    assert resolve_ad_engine(8) == "planar"
    assert resolve_ad_engine(AD_ENGINE_AUTO_DEPTH) == "planar"
    assert resolve_ad_engine(AD_ENGINE_AUTO_DEPTH + 1) == "wavefront"
    assert resolve_ad_engine(50) == "wavefront"
    # rr_terminate shortens the pool's drain -> lower crossover
    # (docs/AD_DEPTH_SWEEP_RR_r04.json).
    assert AD_ENGINE_AUTO_DEPTH_RR < AD_ENGINE_AUTO_DEPTH
    assert resolve_ad_engine(AD_ENGINE_AUTO_DEPTH_RR,
                             rr_terminate=True) == "planar"
    assert resolve_ad_engine(AD_ENGINE_AUTO_DEPTH_RR + 1,
                             rr_terminate=True) == "wavefront"
    assert resolve_ad_engine(AD_ENGINE_AUTO_DEPTH,
                             rr_terminate=False) == "planar"

    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(5)
    ids = _batch(64)
    target = jnp.zeros((64, 3), jnp.float32) + 0.2
    params = params_from_scene(scene, ("albedo",))
    for depth, explicit in ((4, "planar"), (AD_ENGINE_AUTO_DEPTH + 2,
                                            "wavefront")):
        kw = dict(width=W, height=H, spp=2, max_depth=depth,
                  camera_mode="cuda", options=REFERENCE_CUDA)
        la, ga = jax.value_and_grad(render_loss)(
            params, scene, cam, target, ids, key, engine="auto", **kw)
        le, ge = jax.value_and_grad(render_loss)(
            params, scene, cam, target, ids, key, engine=explicit, **kw)
        assert float(la) == float(le), depth
        np.testing.assert_array_equal(np.asarray(ga["albedo"]),
                                      np.asarray(ge["albedo"]))
