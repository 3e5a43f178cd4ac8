"""Regenerative wavefront renderer vs the fixed-wave tiled renderer.

Same RNG contract per (pixel, sample, bounce) -> same sampled radiance;
only the framebuffer accumulation order differs (float reassociation), so
agreement is ~1e-5, not bitwise.
"""

import jax
import numpy as np
import pytest

from raytracinginoneweekend_tpu.config import (DEFAULT, REFERENCE_CUDA,
                                               RenderConfig)
from raytracinginoneweekend_tpu.models.camera import (reference_cpu_camera,
                                                      reference_cuda_camera)
from raytracinginoneweekend_tpu.models.scene import (huge_scene,
                                                     simple_scene_cuda)
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.render import render


@pytest.mark.parametrize("camera_mode", ["cuda", "thinlens"])
def test_wavefront_matches_tiled_simple(camera_mode):
    w, h, spp, depth = 24, 16, 4, 6
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    key = jax.random.key(5)
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=depth,
                       camera_mode=camera_mode, options=DEFAULT)
    want = np.asarray(render(scene, cam, cfg, key)).reshape(-1, 3)
    got = np.asarray(render_wavefront(
        scene, cam, key, width=w, height=h, spp=spp, max_depth=depth,
        camera_mode=camera_mode, options=DEFAULT, pool_size=64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_wavefront_tiny_pool_matches_big_pool():
    """Result must be invariant to pool size (regeneration order)."""
    w, h, spp, depth = 16, 8, 2, 4
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    key = jax.random.key(9)
    kwargs = dict(width=w, height=h, spp=spp, max_depth=depth,
                  camera_mode="thinlens", options=DEFAULT)
    a = np.asarray(render_wavefront(scene, cam, key, **kwargs, pool_size=32))
    b = np.asarray(render_wavefront(scene, cam, key, **kwargs,
                                    pool_size=1 << 14))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_wavefront_deposit_modes_and_slots_match():
    """The framebuffer deposit mechanism (task-indexed ledger vs pixel
    scatter-add) and the pending-slot count are pure accumulation-layout
    choices: same per-ray radiance, so images must agree to float
    reassociation. Also pins the ledger's frame-end static-reshape fold
    against the scatter path's direct pixel indexing."""
    w, h, spp, depth = 24, 16, 4, 6
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    key = jax.random.key(5)
    kwargs = dict(width=w, height=h, spp=spp, max_depth=depth,
                  camera_mode="thinlens", options=DEFAULT, pool_size=256)
    a = np.asarray(render_wavefront(scene, cam, key, **kwargs,
                                    deposit="ledger"))
    b = np.asarray(render_wavefront(scene, cam, key, **kwargs,
                                    deposit="scatter"))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    c = np.asarray(render_wavefront(scene, cam, key, **kwargs,
                                    deposit="ledger", pending_slots=1))
    d = np.asarray(render_wavefront(scene, cam, key, **kwargs,
                                    deposit="ledger", pending_slots=3))
    np.testing.assert_allclose(c, d, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(a, c, rtol=2e-4, atol=2e-5)


def test_rr_termination_unbiased_and_saves_segments():
    """Opt-in Russian-roulette path termination (TraceOptions.rr_*):
    (a) the fused kernel and the XLA fallback draw/act identically,
    (b) traced segments drop materially, (c) the estimator stays
    unbiased -- global image mean within MC noise of the baseline
    (measured: 23.6% fewer segments, mean delta 0.0007 at spp 128)."""
    import dataclasses

    w, h, spp, depth = 32, 24, 128, 12
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    key = jax.random.key(5)
    kw = dict(width=w, height=h, spp=spp, max_depth=depth,
              camera_mode="thinlens", pool_size=4096)
    # rr_scale pinned at 1.0: this test measures the AGGRESSIVE
    # q = attenuation ablation (the 23.6%-fewer-segments figure); the
    # shipped default rr_scale=4.0 trades most of that saving for
    # near-zero variance inflation (docs/RR_EFFICIENCY_r03.jsonl).
    rr = dataclasses.replace(DEFAULT, rr_terminate=True, rr_start=2,
                             rr_qmin=0.05, rr_scale=1.0)

    base, sb = render_wavefront(scene, cam, key, options=DEFAULT,
                                return_stats=True, **kw)
    img_rr, sr = render_wavefront(scene, cam, key, options=rr,
                                  return_stats=True, **kw)
    img_xla = render_wavefront(
        scene, cam, key, options=dataclasses.replace(rr, mega="off"), **kw)
    base, img_rr, img_xla = map(np.asarray, (base, img_rr, img_xla))
    np.testing.assert_allclose(img_rr, img_xla, rtol=2e-4, atol=2e-5)
    assert int(sr["segments"]) < 0.9 * int(sb["segments"])
    assert np.isfinite(img_rr).all()
    assert abs(float(img_rr.mean()) - float(base.mean())) < 5e-3
    assert np.abs(img_rr - base).mean() < 0.02


def test_rr_tiled_engine_matches_planar():
    """Round 5: the tiled engine (ops/integrate.py) honors rr_terminate
    via the shared contract too -- cross-engine agreement at the usual
    accumulation-order tolerance, and the scan/while drivers are
    bitwise equal under rr."""
    import dataclasses

    from raytracinginoneweekend_tpu.ops.integrate_planar import (
        render_pixels_planar)
    from raytracinginoneweekend_tpu.render import render_pixels_impl

    import jax.numpy as jnp

    w, h, spp, depth = 48, 27, 8, 12
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    key = jax.random.key(5)
    rr = dataclasses.replace(DEFAULT, rr_terminate=True)
    kw = dict(width=w, height=h, spp=spp, max_depth=depth,
              camera_mode="cuda")
    t = np.asarray(render_pixels_impl(scene, cam, ids, key, wave_spp=spp,
                                      options=rr, **kw))
    p = np.asarray(render_pixels_planar(scene, cam, ids, key, options=rr,
                                        **kw))
    np.testing.assert_allclose(t, p, rtol=2e-4, atol=2e-5)
    ts = np.asarray(render_pixels_impl(scene, cam, ids, key,
                                       wave_spp=spp, options=rr,
                                       differentiable=True, **kw))
    assert (t == ts).all()


def test_wavefront_huge_scene_finite():
    w, h = 32, 21
    scene = huge_scene(0)
    cam = reference_cpu_camera(w, h)
    out = np.asarray(render_wavefront(
        scene, cam, jax.random.key(0), width=w, height=h, spp=2,
        max_depth=8, camera_mode="thinlens", options=DEFAULT,
        pool_size=1 << 12))
    assert np.isfinite(out).all()
    assert out.max() > 0.1  # sky is visible


def test_wavefront_reference_compat_options():
    w, h, spp, depth = 16, 12, 2, 4
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    key = jax.random.key(2)
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=depth,
                       camera_mode="cuda", options=REFERENCE_CUDA)
    want = np.asarray(render(scene, cam, cfg, key)).reshape(-1, 3)
    got = np.asarray(render_wavefront(
        scene, cam, key, width=w, height=h, spp=spp, max_depth=depth,
        camera_mode="cuda", options=REFERENCE_CUDA, pool_size=128))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_wavefront_edge_shapes():
    """spp=1, single-pixel-ish images, pool far larger than the work."""
    scene = simple_scene_cuda()
    for w, h, spp in ((1, 1, 1), (3, 2, 1), (2, 2, 5)):
        cam = reference_cuda_camera(w, h)
        out = np.asarray(render_wavefront(
            scene, cam, jax.random.key(1), width=w, height=h, spp=spp,
            max_depth=3, camera_mode="pinhole", options=DEFAULT,
            pool_size=1 << 16))
        assert out.shape == (w * h, 3)
        assert np.isfinite(out).all()


@pytest.mark.parametrize("camera_mode", ["cuda", "pinhole", "cpu",
                                         "thinlens"])
def test_wavefront_mega_modes_match(camera_mode):
    """The three engine fusion levels -- "off" (closest-hit kernel + XLA
    fusions), "bounce" (whole-bounce program, ops/pallas_mega.py) and
    "fused" (rotated shade+regen program, ops/pallas_fused.py) -- share
    the RNG contract and the shade math, so they must agree. Tight
    tolerance (not bitwise: compilers may contract FMAs differently
    between the lowerings)."""
    import dataclasses

    key = jax.random.key(7)
    for scene, cam, w, h in (
            (simple_scene_cuda(), reference_cuda_camera(20, 12), 20, 12),
            (huge_scene(0), reference_cpu_camera(16, 10), 16, 10)):
        kwargs = dict(width=w, height=h, spp=2, max_depth=6,
                      camera_mode=camera_mode, pool_size=1 << 12)
        imgs = [np.asarray(render_wavefront(
            scene, cam, key,
            options=dataclasses.replace(DEFAULT, mega=mode), **kwargs))
            for mode in ("off", "bounce", "fused")]
        np.testing.assert_allclose(imgs[1], imgs[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(imgs[2], imgs[0], rtol=1e-5, atol=1e-6)


def test_wavefront_reference_cpu_compat_matches_tiled():
    """REFERENCE_CPU semantics (ball scatter -> the in-kernel cube root,
    cpu sky bias, reference refract) + the quirky "cpu" camera mode,
    through the wavefront engine at every fusion level, vs the tiled
    renderer."""
    import dataclasses

    from raytracinginoneweekend_tpu.config import REFERENCE_CPU

    w, h, spp, depth = 16, 12, 2, 4
    scene = simple_scene_cuda()
    cam = reference_cpu_camera(w, h)
    key = jax.random.key(3)
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=depth,
                       camera_mode="cpu", options=REFERENCE_CPU)
    want = np.asarray(render(scene, cam, cfg, key)).reshape(-1, 3)
    for mode in ("off", "bounce", "fused"):
        got = np.asarray(render_wavefront(
            scene, cam, key, width=w, height=h, spp=spp, max_depth=depth,
            camera_mode="cpu",
            options=dataclasses.replace(REFERENCE_CPU, mega=mode),
            pool_size=256))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5,
                                   err_msg=f"mega={mode}")


def test_wavefront_ray_id_overflow_guard():
    import pytest

    scene = simple_scene_cuda()
    cam = reference_cuda_camera(4, 4)
    with pytest.raises(ValueError, match="overflows"):
        render_wavefront(scene, cam, jax.random.key(0), width=40000,
                         height=40000, spp=4096, max_depth=2,
                         camera_mode="pinhole", options=DEFAULT)


def test_wavefront_hit_kernel_mxu_matches():
    """options.hit_kernel='mxu' (sphere-minor MXU closest hit) must render
    the same image as the sublane kernel except where a knife-edge
    candidate resolves differently under the regrouped-dot f32 rounding:
    those paths diverge entirely, so (like the golden-oracle suite) a
    <=1% pixel outlier budget applies and everything else is tight."""
    import dataclasses

    w, h, spp, depth = 24, 16, 4, 6
    scene = huge_scene(0)
    cam = reference_cpu_camera(w, h)
    key = jax.random.key(7)
    kwargs = dict(width=w, height=h, spp=spp, max_depth=depth,
                  camera_mode="thinlens", pool_size=1 << 12)
    for mega in ("fused", "off"):
        base = dataclasses.replace(DEFAULT, mega=mega)
        a = np.asarray(render_wavefront(scene, cam, key, **kwargs,
                                        options=base))
        b = np.asarray(render_wavefront(
            scene, cam, key, **kwargs,
            options=dataclasses.replace(base, hit_kernel="mxu")))
        err = np.abs(a - b) / (np.abs(a) + 1e-3)
        outliers = (err.max(axis=-1) > 1e-3).mean()
        assert outliers <= 0.01, (mega, outliers, err.max())


def test_tile_ownership_images_bit_identical():
    """ownership='tile' (block-contiguous tile-swizzled task ownership,
    the coherence layout for hit_kernel='sorted') must reproduce the
    strided engine's image BIT-exactly on both scenes, across the fused
    and XLA bodies, the sorted kernel, the scatter-deposit fallback and
    the stats path -- the RNG contract keys by (pixel, sample), so only
    the task->lane mapping moves, and the ledger fold sums each pixel's
    tasks in the same order."""
    import dataclasses

    from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
    from raytracinginoneweekend_tpu.models.scene import (huge_scene,
                                                         simple_scene_cuda)

    for scene, w, h in ((simple_scene_cuda(), 40, 24), (huge_scene(0), 36,
                                                        20)):
        cam = reference_cpu_camera(w, h)
        key = jax.random.key(0)
        kw = dict(width=w, height=h, spp=4, max_depth=6,
                  camera_mode="thinlens", pool_size=2048)
        base = np.asarray(render_wavefront(scene, cam, key, options=DEFAULT,
                                           **kw))
        assert np.isfinite(base).all() and base.max() > 0.05
        for mega, hk in (("off", "sublane"), ("fused", "sublane"),
                         ("fused", "sorted")):
            o = dataclasses.replace(DEFAULT, ownership="tile", mega=mega,
                                    hit_kernel=hk)
            got = np.asarray(render_wavefront(scene, cam, key, options=o,
                                              **kw))
            np.testing.assert_array_equal(base, got, err_msg=f"{mega}/{hk}")
        o = dataclasses.replace(DEFAULT, ownership="tile")
        got = np.asarray(render_wavefront(scene, cam, key, options=o,
                                          deposit="scatter", **kw))
        np.testing.assert_array_equal(base, got, err_msg="scatter")
        got2, st = render_wavefront(scene, cam, key, options=o,
                                    return_stats=True, **kw)
        np.testing.assert_array_equal(base, np.asarray(got2))
        assert int(st["segments"]) > 0


def test_resolve_variants_bit_identical():
    """All winning-sphere resolve variants are EXACT gathers (one nonzero
    0/1 term per one-hot row against an f32 table), so 'split' (factorized
    lo-matmul + hi-select) and 'f32' (one-hot kept in f32, no bf16
    convert) must reproduce the default's image bit-exactly. Both ship as
    documented perf ablations (ARCHITECTURE.md 'Resolve phase closure');
    this pins their correctness."""
    import dataclasses

    from raytracinginoneweekend_tpu.models.scene import simple_scene_cuda

    for scene, w, h in ((simple_scene_cuda(), 32, 20), (huge_scene(0),
                                                        28, 16)):
        cam = reference_cpu_camera(w, h)
        key = jax.random.key(3)
        kw = dict(width=w, height=h, spp=4, max_depth=6,
                  camera_mode="thinlens", pool_size=2048)
        base = np.asarray(render_wavefront(scene, cam, key, options=DEFAULT,
                                           **kw))
        assert np.isfinite(base).all() and base.max() > 0.05
        for resolve in ("split", "f32"):
            o = dataclasses.replace(DEFAULT, resolve=resolve)
            got = np.asarray(render_wavefront(scene, cam, key, options=o,
                                              **kw))
            np.testing.assert_array_equal(base, got, err_msg=resolve)


def test_reserve_tail_stealing_matches_default():
    """reserve_frac withholds the task-space tail and grants it to
    exhausted-idle lanes at epoch boundaries (round 4): images must
    match the reserve-off engine to accumulation order, with every
    reserve task rendered exactly once (the mean over a bright scene
    catches drops/doubles), across deposit modes, fusion levels, rr,
    and multi-sample tasks (spp > task_samples exercises per-pixel
    fold ordering with the scatter-accumulated reserve)."""
    import dataclasses

    scene = huge_scene(0)
    w, h = 48, 32
    cam = reference_cpu_camera(w, h)
    key = jax.random.key(0)
    kw = dict(width=w, height=h, spp=24, max_depth=6,
              camera_mode="thinlens", pool_size=1024, task_samples=8)
    base = np.asarray(render_wavefront(scene, cam, key, options=DEFAULT,
                                       **kw))
    for label, extra in [
            ("rf.1", dict(reserve_frac=0.1)),
            ("rf.3", dict(reserve_frac=0.3)),
            ("rf.1+scatter", dict(reserve_frac=0.1, deposit="scatter")),
    ]:
        got = np.asarray(render_wavefront(scene, cam, key, options=DEFAULT,
                                          **kw, **extra))
        np.testing.assert_allclose(base, got, rtol=2e-6, atol=2e-6,
                                   err_msg=label)
    for opts in (dataclasses.replace(DEFAULT, mega="off"),
                 dataclasses.replace(DEFAULT, rr_terminate=True)):
        a = np.asarray(render_wavefront(scene, cam, key, options=opts,
                                        **kw))
        b = np.asarray(render_wavefront(scene, cam, key, options=opts,
                                        reserve_frac=0.15, **kw))
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)
    # tile ownership has its own fold; reserve is silently inert there
    o = dataclasses.replace(DEFAULT, ownership="tile")
    a = np.asarray(render_wavefront(scene, cam, key, options=o, **kw))
    b = np.asarray(render_wavefront(scene, cam, key, options=o,
                                    reserve_frac=0.2, **kw))
    np.testing.assert_array_equal(a, b)


def test_wall_scene_engines_agree():
    """models/scene.wall_scene (the depth-bounded demonstration workload
    for hit_kernel='sorted' + ownership='tile', scripts/bench_wall.py):
    the sorted/tile combos must reproduce the sublane/strided image
    bit-exactly on it, same gate as the huge/simple parity tests."""
    import dataclasses

    from raytracinginoneweekend_tpu.models.camera import make_camera
    from raytracinginoneweekend_tpu.models.scene import (validate_scene,
                                                         wall_scene)

    scene = validate_scene(wall_scene(0))
    assert int(scene.num_spheres) == 484
    w, h = 36, 24
    cam = make_camera((0.0, 11.0, 4.0), (0.0, 11.0, 0.0), (0, 1, 0),
                      w / h, 60.0, 0.0, 4.0)
    key = jax.random.key(1)
    kw = dict(width=w, height=h, spp=4, max_depth=4,
              camera_mode="pinhole", pool_size=2048)
    base = np.asarray(render_wavefront(scene, cam, key, options=DEFAULT,
                                       **kw))
    assert np.isfinite(base).all() and base.max() > 0.05
    for hk, own in (("sublane", "tile"), ("sorted", "strided"),
                    ("sorted", "tile")):
        o = dataclasses.replace(DEFAULT, hit_kernel=hk, ownership=own)
        got = np.asarray(render_wavefront(scene, cam, key, options=o,
                                          **kw))
        np.testing.assert_array_equal(base, got, err_msg=f"{hk}/{own}")
