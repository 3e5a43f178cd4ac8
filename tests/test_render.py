import jax
import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.config import DEFAULT, RenderConfig, TraceOptions
from raytracinginoneweekend_tpu.models.camera import reference_cuda_camera
from raytracinginoneweekend_tpu.models.scene import simple_scene_cuda
from raytracinginoneweekend_tpu.ops.postprocess import to_u8
from raytracinginoneweekend_tpu.render import render, render_pixels

W, H = 32, 18


def _cfg(**kw):
    base = dict(width=W, height=H, spp=4, max_depth=8, camera_mode="cuda",
                options=TraceOptions())
    base.update(kw)
    return RenderConfig(**base)


def test_render_shape_and_finite():
    img = render(simple_scene_cuda(), reference_cuda_camera(W, H), _cfg(),
                 jax.random.key(1))
    assert img.shape == (H, W, 3)
    arr = np.asarray(img)
    assert np.all(np.isfinite(arr))
    assert arr.max() > 0.1  # scene is actually lit
    # Top rows should be sky-ish blue (background gradient).
    top = arr[0].mean(axis=0)
    assert top[2] > top[0]  # blue channel dominates red in the sky


def test_render_deterministic():
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    a = np.asarray(render(scene, cam, _cfg(), jax.random.key(7)))
    b = np.asarray(render(scene, cam, _cfg(), jax.random.key(7)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render(scene, cam, _cfg(), jax.random.key(8)))
    assert not np.array_equal(a, c)


def test_render_chunk_invariance():
    """The image must not depend on how pixels/samples are tiled into
    device programs (counter-based RNG keyed on global ids only)."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(3)
    a = np.asarray(render(scene, cam, _cfg(rays_per_chunk=1 << 20), key))
    b = np.asarray(render(scene, cam, _cfg(rays_per_chunk=64), key))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_wave_spp_invariance():
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(5)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    kw = dict(width=W, height=H, spp=5, max_depth=6, camera_mode="cuda",
              options=TraceOptions())
    a = render_pixels(scene, cam, ids, key, wave_spp=5, **kw)
    b = render_pixels(scene, cam, ids, key, wave_spp=2, **kw)  # 3 waves, pad
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_probe_rr_qcap_unbiased():
    """The surrogate probe estimator (round 5): trace_fast with forced
    capped RR (rr_terminate + rr_qcap=0.5 -- silhouette._probe_options /
    PROBE_RR_QCAP) must be an UNBIASED estimator of the no-RR radiance:
    survivors boost 1/q, so the per-key mean over many keys converges to
    the exact trace. Also pins that the cap actually kills bright paths
    (fewer live bounces: radiance per key DIFFERS from no-RR)."""
    from raytracinginoneweekend_tpu.ops.integrate import trace_fast
    from raytracinginoneweekend_tpu.ops.silhouette import (PROBE_RR_QCAP,
                                                           _probe_options)
    from raytracinginoneweekend_tpu.render import make_primary_rays

    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    n = W * H
    pids = jnp.arange(n, dtype=jnp.int32)
    depth = 12
    popts = _probe_options(DEFAULT)
    # FIXED ray geometry; per-arm ray KEYS vary, so both arms average
    # over the same scatter-draw distribution and only the RR policy
    # differs (the RR words are part of the same per-ray key stream).
    o, d, _ = make_primary_rays(cam, pids, jnp.zeros_like(pids),
                                jax.random.key(0), W, H, "cuda")

    def one(k, opts, qcap):
        ks = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.key(100 + k), pids)
        return np.asarray(trace_fast(scene, o, d, ks, depth, opts,
                                     rr_qcap=qcap))

    n_keys = 32
    plain = np.stack([one(k, DEFAULT, 1.0) for k in range(n_keys)])
    capped = np.stack([one(k, popts, PROBE_RR_QCAP)
                       for k in range(n_keys)])
    # Per-key it is a DIFFERENT (noisier) estimator...
    assert np.abs(capped[0] - plain[0]).max() > 1e-3
    # ...whose expectation matches: global means agree within a few
    # combined standard errors.
    se = float(np.hypot(plain.mean(axis=(1, 2)).std() / np.sqrt(n_keys),
                        capped.mean(axis=(1, 2)).std() / np.sqrt(n_keys)))
    assert abs(float(capped.mean()) - float(plain.mean())) < 4.0 * se, (
        capped.mean(), plain.mean(), se)


def test_differentiable_matches_fast():
    """scan-based trace and while_loop trace produce identical radiance."""
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(W, H)
    key = jax.random.key(2)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    kw = dict(width=W, height=H, spp=2, wave_spp=2, max_depth=8,
              camera_mode="cuda", options=TraceOptions())
    a = render_pixels(scene, cam, ids, key, differentiable=True, **kw)
    b = render_pixels(scene, cam, ids, key, differentiable=False, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_postprocess_u8():
    img = jnp.asarray([[[0.0, 0.5, 1.0], [2.0, -0.1, 0.25]]])
    u8 = np.asarray(to_u8(img))
    assert u8.dtype == np.uint8
    assert u8[0, 0, 0] == 0
    assert u8[0, 0, 2] == 255
    assert u8[0, 1, 0] == 255  # clamped
    assert u8[0, 1, 1] == 0  # negative clamped
    expect_half = int(0.5 ** (1 / 2.2) * 255)
    assert abs(int(u8[0, 0, 1]) - expect_half) <= 1


def test_validate_scene_catches_quirk_q8():
    """A dangling material_index (reference quirk Q8) must raise."""
    import pytest

    from raytracinginoneweekend_tpu.models.scene import (simple_scene_cuda,
                                                         validate_scene)

    scene = simple_scene_cuda()
    assert validate_scene(scene) is scene
    bad = scene._replace(
        material_index=scene.material_index.at[2].set(99))
    with pytest.raises(ValueError, match="Q8"):
        validate_scene(bad)
    nan = scene._replace(albedo=scene.albedo.at[0, 0].set(jnp.nan))
    with pytest.raises(ValueError, match="non-finite"):
        validate_scene(nan)
    zr = scene._replace(radii=scene.radii.at[0].set(0.0))
    with pytest.raises(ValueError, match="zero-radius"):
        validate_scene(zr)


def test_degenerate_inputs_produce_no_nans():
    """Robustness: near-degenerate rays/scenes stay NaN-free end to end."""
    from raytracinginoneweekend_tpu.models.scene import Scene, LAMBERT

    # ior exactly 1 (no refraction bending), tiny radius, huge radius.
    scene = Scene(
        centers=jnp.asarray([[0., 0., -1.], [0., -100.5, -1.],
                             [0.5, 0., -1.]], jnp.float32),
        radii=jnp.asarray([1e-4, 100.0, 0.5], jnp.float32),
        material_index=jnp.asarray([0, 0, 1], jnp.int32),
        mtype=jnp.asarray([LAMBERT, 2], jnp.int32),
        albedo=jnp.asarray([[.5, .5, .5], [1., 1., 1.]], jnp.float32),
        fuzz=jnp.zeros((2,), jnp.float32),
        ior=jnp.asarray([1.0, 1.0], jnp.float32),
    )
    cam = reference_cuda_camera(16, 8)
    out = render_pixels(scene, cam, jnp.arange(128, dtype=jnp.int32),
                        jax.random.key(0), width=16, height=8, spp=2,
                        wave_spp=2, max_depth=6, camera_mode="thinlens",
                        options=DEFAULT)
    assert np.isfinite(np.asarray(out)).all()


def test_stratified_sampling_unbiased_and_engine_invariant():
    """Opt-in TraceOptions.sampling='stratified' (ops/rng.stratify_uv):
    the TAG_JITTER words are remapped so u is exactly stratified over
    the spp strata and v rides a van-der-Corput sequence under a
    full-range rotation. Checks: (a) every engine implements the remap
    identically (fused wavefront == XLA wavefront BIT-exact; tiled
    agrees to accumulation order), (b) the estimator stays unbiased
    (mean within MC noise of iid), (c) it actually reduces variance on
    the huge cover config (measured ratio 0.83 at 16 spp over 8 keys;
    0.47 on a pinhole simple-scene config where the AA dimension
    dominates -- the per-PIXEL rotation is what makes the van der
    Corput structure engage, see rng.stratify_uv).
    """
    import dataclasses

    import jax
    import numpy as np

    from raytracinginoneweekend_tpu.config import DEFAULT
    from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
    from raytracinginoneweekend_tpu.models.scene import huge_scene
    from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
    from raytracinginoneweekend_tpu.render import render_pixels

    import jax.numpy as jnp

    scene = huge_scene(0)
    w, h, spp = 48, 32, 16
    cam = reference_cpu_camera(w, h)
    key = jax.random.key(0)
    strat = dataclasses.replace(DEFAULT, sampling="stratified")
    kw = dict(width=w, height=h, spp=spp, max_depth=6,
              camera_mode="thinlens")
    a = np.asarray(render_wavefront(scene, cam, key, options=strat,
                                    pool_size=2048, **kw))
    b = np.asarray(render_wavefront(
        scene, cam, key, options=dataclasses.replace(strat, mega="off"),
        pool_size=2048, **kw))
    np.testing.assert_array_equal(a, b)  # in-kernel == XLA remap
    # Tile ownership: the in-kernel vp_to_pid de-swizzle must feed the
    # SAME pid into the first-bounce stratification as the XLA body's
    # task_pixel -- bit-equal fused vs XLA again under ownership="tile".
    t_opts = dataclasses.replace(strat, ownership="tile")
    at = np.asarray(render_wavefront(scene, cam, key, options=t_opts,
                                     pool_size=2048, **kw))
    bt = np.asarray(render_wavefront(
        scene, cam, key, options=dataclasses.replace(t_opts, mega="off"),
        pool_size=2048, **kw))
    np.testing.assert_array_equal(at, bt)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    c = np.asarray(render_pixels(scene, cam, ids, key, wave_spp=spp,
                                 options=strat, **kw))
    # The tiled engine shares the stratified jitter+lens remap
    # bit-exactly (checked directly for the remap) but uses a DIFFERENT
    # closest-hit implementation (jnp t-space vs the Pallas q-space
    # kernel): this particular stratified ray set includes a handful of
    # knife-edge candidates whose winner flips between the two, each
    # worth one sample's radiance difference (measured up to ~0.51/spp
    # with the lens dimension stratified; a flipped path is bounded by
    # the sky's max radiance ~1.7). Bound the flip fraction and the
    # one-sample magnitude instead of demanding allclose.
    close = np.isclose(a, c, rtol=2e-4, atol=2e-5)
    assert close.mean() > 0.99, close.mean()
    assert np.abs(a - c).max() < 0.8 / spp
    assert abs(a.mean() - c.mean()) < 1e-3

    n = 6
    var = {}
    mean = {}
    for smp in ("iid", "stratified"):
        o = dataclasses.replace(DEFAULT, sampling=smp)
        fr = np.stack([np.asarray(render_wavefront(
            scene, cam, jax.random.key(k), options=o, pool_size=2048,
            **kw)) for k in range(n)])
        var[smp] = fr.var(0, ddof=1).mean()
        mean[smp] = fr.mean()
    # Unbiased: means agree within a few x the per-run standard error.
    se = np.sqrt(var["iid"] / (n * w * h * 3))
    assert abs(mean["stratified"] - mean["iid"]) < 8 * se
    # Variance strictly helped (measured 0.83; bound loose vs noise).
    assert var["stratified"] < 0.93 * var["iid"], (
        var["stratified"] / var["iid"])


def test_stratify_lens_uv_properties():
    """rng.stratify_lens_uv (the lens half of sampling='stratified'):
    (a) de-rotated u values land exactly one per stratum and de-rotated
    v equals the van der Corput set (equidistribution survives the
    toroidal rotation); (b) sample 0's u stays uniform across pixels --
    the property that forced the rotation words onto the unconsumed
    (pid, 0) (TAG_LENS, j=2) counter (reusing sample 0's own lens word
    would fold the same uniform into u twice; frac(c*U) is non-uniform
    for non-integer c)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracinginoneweekend_tpu.ops import rng
    from raytracinginoneweekend_tpu.ops import threefry as tf

    spp = 16
    sid = jnp.arange(spp, dtype=jnp.int32)
    key = jax.random.key(11)

    # (a) one pixel: exact equidistribution after de-rotation.
    k0, k1 = tf.key_words(rng.ray_key(key, 7, 0))
    rot_u, rot_v = tf.draw_uniform2(k0, k1, rng.TAG_LENS, 2)
    lu0 = jnp.linspace(0.1, 0.9, spp)  # stand-in iid jitters
    u, v = rng.stratify_lens_uv(lu0, rot_u, rot_v, sid, spp)
    assert ((u >= 0) & (u < 1)).all() and ((v >= 0) & (v < 1)).all()
    du = np.sort(np.floor(((np.asarray(u) - float(rot_u)) % 1.0) * spp))
    np.testing.assert_array_equal(du, np.arange(spp))
    dv = np.sort((np.asarray(v) - float(rot_v)) % 1.0)
    vdc = np.sort([int(f"{s:04b}"[::-1], 2) / spp for s in range(spp)])
    np.testing.assert_allclose(dv, vdc, atol=1e-6)

    # (b) sample 0 across many pixels: uniform (mean 1/2, flat deciles).
    pids = jnp.arange(4096, dtype=jnp.int32)

    def s0_u(pid):
        rk = rng.ray_key(key, pid, 0)
        a0, a1 = tf.key_words(rk)
        lu, _ = tf.draw_uniform2(a0, a1, rng.TAG_LENS, 0)
        ru, rv = tf.draw_uniform2(a0, a1, rng.TAG_LENS, 2)
        return rng.stratify_lens_uv(lu, ru, rv, jnp.int32(0), spp)[0]

    us = np.asarray(jax.vmap(s0_u)(pids))
    assert abs(us.mean() - 0.5) < 0.02
    hist = np.histogram(us, bins=10, range=(0, 1))[0] / us.size
    assert np.abs(hist - 0.1).max() < 0.03, hist


def test_strat0_scatter_consistency_and_guard():
    """First-bounce stratification (round 4): (a) the key-array form
    (rng.strat0_scatter) and the planar form
    (planar.strat0_scatter_planes) produce bit-identical vectors --
    the cross-engine contract; (b) for one pixel the spp de-rotated
    bounce-0 thetas cover every stratum exactly once (the substitution
    is ACTIVE, not silently skipped); (c) mega='bounce' refuses
    sampling='stratified' (its kernel state cannot honor the
    first-bounce half)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest

    from raytracinginoneweekend_tpu.config import DEFAULT, TraceOptions
    from raytracinginoneweekend_tpu.ops import planar, rng
    from raytracinginoneweekend_tpu.ops import threefry as tf

    spp, n = 16, 256
    base = jax.random.key(9)
    pid = jnp.arange(n, dtype=jnp.int32) % 37
    sid = jnp.arange(n, dtype=jnp.int32) % spp

    vec_t = jax.vmap(lambda k, p_, s_: rng.strat0_scatter(
        k, p_, s_, base, spp, "unit"))(
            jax.vmap(lambda p_, s_: rng.ray_key(base, p_, s_))(pid, sid),
            pid, sid)

    pidp = pid.reshape(2, 128)
    sidp = sid.reshape(2, 128)
    k0, k1 = planar.ray_key_words(base, pidp, sidp)
    b0, b1 = tf.key_words(base)
    x, y, z = planar.strat0_scatter_planes(k0, k1, pidp, sidp, b0, b1,
                                           spp, True)
    vec_p = jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], -1)
    np.testing.assert_array_equal(np.asarray(vec_t), np.asarray(vec_p))

    # (b) stratum coverage for one pixel: recover theta strata.
    sids = jnp.arange(spp, dtype=jnp.int32)
    keys = jax.vmap(lambda s_: rng.ray_key(base, 5, 0 * s_ + s_))(sids)
    vecs = np.asarray(jax.vmap(lambda k, s_: rng.strat0_scatter(
        k, 5, s_, base, spp, "unit"))(keys, sids))
    z0, z1 = tf.key_words(rng.ray_key(base, 5, 0))
    rot_u, _ = tf.draw_uniform2(z0, z1, jnp.uint32(rng.TAG_BOUNCE), 3)
    zc = vecs[:, 2]  # z = 2*u - 1 under the polar map
    u = (zc + 1.0) / 2.0
    strata = np.sort(np.floor(((u - float(rot_u)) % 1.0) * spp))
    np.testing.assert_array_equal(strata, np.arange(spp))

    with _pytest.raises(ValueError, match="mega='bounce'"):
        dataclasses.replace(TraceOptions(), sampling="stratified",
                            mega="bounce")
    assert DEFAULT.sampling == "iid"  # parity default untouched
