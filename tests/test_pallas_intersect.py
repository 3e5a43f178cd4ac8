"""Pallas fused closest-hit vs the jnp path (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracinginoneweekend_tpu.config import DEFAULT, TraceOptions
from raytracinginoneweekend_tpu.models.camera import reference_cuda_camera
from raytracinginoneweekend_tpu.models.scene import (huge_scene,
                                                     simple_scene_cuda)
from raytracinginoneweekend_tpu.ops.intersect import closest_hit
from raytracinginoneweekend_tpu.ops.pallas_intersect import closest_hit_pallas

T_MIN = 0.008


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = (rng.normal(size=(n, 3)) * 2).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_pallas_matches_jnp_simple_scene():
    scene = simple_scene_cuda()
    o, d = _random_rays(300)
    t1, i1, h1 = closest_hit(o, d, scene.centers, scene.radii, T_MIN)
    t2, i2, h2 = closest_hit_pallas(o, d, scene.centers, scene.radii, T_MIN)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=2e-4, atol=1e-3)  # grazing hits amplify fma-ordering cancellation; hit/idx exact


def test_pallas_matches_jnp_huge_scene():
    scene = huge_scene(0)
    o, d = _random_rays(4096 + 7, seed=3)  # exercises ray padding
    t1, i1, h1 = closest_hit(o, d, scene.centers, scene.radii, T_MIN)
    t2, i2, h2 = closest_hit_pallas(o, d, scene.centers, scene.radii, T_MIN)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=2e-4, atol=1e-3)  # grazing hits amplify fma-ordering cancellation; hit/idx exact


def test_pallas_negative_radius_hollow_glass():
    scene = simple_scene_cuda()  # sphere 4 has r = -0.499 (quirk Q10)
    o = jnp.asarray([[-1.0, 0.0, -1.0]], jnp.float32)
    d = jnp.asarray([[0.3, 0.1, 1.0]], jnp.float32)
    t1, i1, h1 = closest_hit(o, d, scene.centers, scene.radii, T_MIN)
    t2, i2, h2 = closest_hit_pallas(o, d, scene.centers, scene.radii, T_MIN)
    assert bool(h2[0])
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=2e-4, atol=1e-3)  # grazing hits amplify fma-ordering cancellation; hit/idx exact


def test_tiled_render_with_pallas_intersect():
    """End-to-end through the TILED engine: options.intersect='pallas'
    dispatches closest_hit_pallas inside trace_fast (integrate.
    closest_hit_opt) and must match the 'jnp' tiled render. (The wavefront
    engine always uses the pallas_segment megakernel and never reads
    options.intersect, so driving it would compare identical paths.)"""
    from raytracinginoneweekend_tpu.render import render_pixels

    w, h, spp, depth = 16, 8, 2, 4
    scene = simple_scene_cuda()
    cam = reference_cuda_camera(w, h)
    key = jax.random.key(4)
    ids = jnp.arange(w * h, dtype=jnp.int32)
    kwargs = dict(width=w, height=h, spp=spp, wave_spp=spp,
                  max_depth=depth, camera_mode="thinlens")
    a = np.asarray(render_pixels(scene, cam, ids, key, options=DEFAULT,
                                 **kwargs))
    b = np.asarray(render_pixels(scene, cam, ids, key,
                                 options=TraceOptions(intersect="pallas"),
                                 **kwargs))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_grouped_kernel_matches_ungrouped():
    """The depth-band culled kernel must agree with the plain one (the
    bound test is conservative) on the huge scene."""
    import jax

    from raytracinginoneweekend_tpu.ops.pallas_segment import (
        group_scene, sphere_params_from_scene, trace_segment)

    scene = huge_scene(0)
    sp = sphere_params_from_scene(scene)
    sp_sorted, groups = group_scene(sp)
    rng = np.random.default_rng(5)
    R = 8
    rays = tuple(jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))
                 for _ in range(6))
    a = trace_segment(rays, sp, T_MIN, rows=R)
    b = trace_segment(rays, sp_sorted, T_MIN, rows=R, group_params=groups)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    hit = np.asarray(a["hit"]) > 0
    np.testing.assert_allclose(np.asarray(a["t"])[hit],
                               np.asarray(b["t"])[hit], rtol=2e-4, atol=1e-3)
    for k in ("ar", "ag", "ab", "fz", "io", "mt"):
        np.testing.assert_allclose(np.asarray(a[k])[hit],
                                   np.asarray(b[k])[hit], rtol=1e-6,
                                   atol=1e-6)


def test_mxu_kernel_matches_sublane_kernel():
    """Sphere-minor (MXU dot-product) closest hit vs the sublane kernel.

    The dots are algebraically regrouped (d.o - d.C vs d.(o - C)), so t
    agrees only to f32 cancellation noise on grazing candidates;
    hit/winner flips are confined to knife-edge candidates and absent at
    this seed.
    """
    from raytracinginoneweekend_tpu.ops.pallas_segment import (
        segment_closest_hit, segment_closest_hit_mxu,
        sphere_params_from_scene)

    scene = huge_scene(0)
    sp = sphere_params_from_scene(scene)
    cx, cy, cz, r = sp[:4]
    rng = np.random.default_rng(11)
    shape = (16, 128)
    ox = jnp.asarray(rng.uniform(-12, 12, shape).astype(np.float32))
    oy = jnp.asarray(rng.uniform(0.05, 3, shape).astype(np.float32))
    oz = jnp.asarray(rng.uniform(-12, 12, shape).astype(np.float32))
    dx, dy, dz = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
                  for _ in range(3))
    rays = (ox, oy, oz, dx, dy, dz)
    h1, t1, s1 = segment_closest_hit(rays, cx, cy, cz, r, T_MIN, rows=8)
    h2, t2, s2 = segment_closest_hit_mxu(rays, cx, cy, cz, r, T_MIN, rb=256)
    h1, t1, s1, h2, t2, s2 = map(np.asarray, (h1, t1, s1, h2, t2, s2))
    # Knife-edge candidates (grazing discriminants, far-root windows) may
    # legitimately flip under the regrouped-dot rounding; everything else
    # must agree exactly.
    assert (h1 != h2).mean() < 5e-3
    both = (h1 > 0) & (h2 > 0)
    assert (s1[both] != s2[both]).mean() < 5e-3
    agree = both & (s1 == s2)
    # atol covers near-t_min grazing roots where cancellation noise is
    # absolute (~1e-4), not relative.
    np.testing.assert_allclose(t1[agree], t2[agree], rtol=5e-3, atol=2e-4)
    assert h1.mean() > 0.3  # the sample actually exercises hits

    # Dead-block skip: an all-inactive pool must not read stale memory.
    act = jnp.zeros(shape, jnp.int32)
    h3, _, _ = segment_closest_hit_mxu(rays, cx, cy, cz, r, T_MIN, rb=256,
                                       active=act)
    assert np.asarray(h3).sum() == 0


def test_sorted_kernel_matches_sublane_kernel():
    """Distance-ordered early-exit closest hit vs the plain sublane loop.

    The candidate math is identical and skipping is driven by
    conservative bounds, so (hit, t) must be BIT-identical; the winning
    sphere id may differ only on exact f32 q ties (absent at these
    seeds). Exercises: mixed up/down/sky rays, inactive lanes, and a
    deliberately STALE reference point (bounds must hold for any O_c).
    """
    from raytracinginoneweekend_tpu.ops.pallas_segment import (
        segment_closest_hit, segment_closest_hit_sorted, sorted_cull_state,
        sphere_params_from_scene)

    scene = huge_scene(0)
    sp = sphere_params_from_scene(scene)
    cx, cy, cz, r = sp[:4]
    for seed in (0, 7, 42):
        rng = np.random.default_rng(seed)
        shape = (16, 128)
        ox = jnp.asarray(rng.uniform(-14, 14, shape).astype(np.float32))
        oy = jnp.asarray(rng.uniform(-0.5, 6, shape).astype(np.float32))
        oz = jnp.asarray(rng.uniform(-14, 14, shape).astype(np.float32))
        dx, dy, dz = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
                      for _ in range(3))
        rays = (ox, oy, oz, dx, dy, dz)
        act = jnp.asarray(rng.random(shape) < 0.9)

        h1, t1, s1 = segment_closest_hit(rays, cx, cy, cz, r, T_MIN,
                                         rows=8, active=act)
        ss = sorted_cull_state(act, (ox, oy, oz), cx, cy, cz, r, rows=8)
        h2, t2, s2 = segment_closest_hit_sorted(rays, cx, cy, cz, r, ss,
                                                T_MIN, rows=8, active=act)
        a = np.asarray(act)
        h1, t1, s1, h2, t2, s2 = map(np.asarray, (h1, t1, s1, h2, t2, s2))
        np.testing.assert_array_equal(h1[a], h2[a])
        hit = a & (h1 > 0)
        np.testing.assert_array_equal(t1[hit], t2[hit])
        np.testing.assert_array_equal(s1[hit], s2[hit])
        assert h1[a].mean() > 0.3

        # Stale reference point: bounds must hold for ANY O_c -- feed the
        # sort state origins shifted by a large offset.
        ss_stale = sorted_cull_state(
            act, (ox + 9.0, oy + 3.0, oz - 7.0), cx, cy, cz, r, rows=8)
        h3, t3, s3 = segment_closest_hit_sorted(
            rays, cx, cy, cz, r, ss_stale, T_MIN, rows=8, active=act)
        np.testing.assert_array_equal(h1[a], np.asarray(h3)[a])
        np.testing.assert_array_equal(t1[hit], np.asarray(t3)[hit])
        np.testing.assert_array_equal(s1[hit], np.asarray(s3)[hit])

    # Dead-block skip parity with the other kernels.
    act0 = jnp.zeros(shape, jnp.int32)
    ss0 = sorted_cull_state(act0, (ox, oy, oz), cx, cy, cz, r, rows=8)
    h4, _, _ = segment_closest_hit_sorted(rays, cx, cy, cz, r, ss0, T_MIN,
                                          rows=8, active=act0)
    assert np.asarray(h4).sum() == 0


def test_wavefront_sorted_kernel_image_identical():
    """End-to-end: render_wavefront(hit_kernel='sorted') must reproduce
    the sublane engine's image BIT-exactly on both scenes (same winners,
    same draws, same accumulation order)."""
    import dataclasses

    from raytracinginoneweekend_tpu.config import DEFAULT
    from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
    from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront

    opts_sorted = dataclasses.replace(DEFAULT, hit_kernel="sorted")
    for scene, w, h in ((simple_scene_cuda(), 32, 18), (huge_scene(0), 24, 16)):
        cam = reference_cpu_camera(w, h)
        kw = dict(width=w, height=h, spp=4, max_depth=8,
                  camera_mode="thinlens", pool_size=2048)
        key = jax.random.key(0)
        a = np.asarray(render_wavefront(scene, cam, key, options=DEFAULT,
                                        **kw))
        b = np.asarray(render_wavefront(scene, cam, key,
                                        options=opts_sorted, **kw))
        np.testing.assert_array_equal(a, b)
        assert np.isfinite(a).all() and a.max() > 0.05
