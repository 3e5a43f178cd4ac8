"""Dual-pool wavefront engine: parity, determinism, edge configs.

The dual engine must produce the same per-(pixel, sample) radiance as
every other engine (shared RNG + shading contracts); only framebuffer
accumulation order may differ (~1e-5 float reassociation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekend_tpu.config import DEFAULT, REFERENCE_CUDA
from raytracinginoneweekend_tpu.models.camera import (
    reference_cpu_camera, reference_cuda_camera)
from raytracinginoneweekend_tpu.models.scene import (huge_scene,
                                                     simple_scene_cuda)
from raytracinginoneweekend_tpu.ops.pallas_segment import (
    segment_closest_hit, segment_closest_hit_list, UNROLL_LIST)
from raytracinginoneweekend_tpu.ops.wavefront import render_wavefront
from raytracinginoneweekend_tpu.ops.wavefront_dual import (
    render_wavefront_dual)

KEY = jax.random.key(0)


def _render_pair(scene, cam, camera_mode, options, w=64, h=48, spp=4,
                 depth=8, **dual_kw):
    img1 = np.asarray(render_wavefront(
        scene, cam, KEY, width=w, height=h, spp=spp, max_depth=depth,
        camera_mode=camera_mode, options=options, pool_size=4096))
    img2 = np.asarray(render_wavefront_dual(
        scene, cam, KEY, width=w, height=h, spp=spp, max_depth=depth,
        camera_mode=camera_mode, options=options, pool_size=3 * 8192,
        **dual_kw))
    return img1, img2


def test_huge_scene_matches_single_pool():
    img1, img2 = _render_pair(huge_scene(0), reference_cpu_camera(64, 48),
                              "thinlens", DEFAULT)
    np.testing.assert_allclose(img1, img2, atol=5e-5)


def test_simple_scene_matches_single_pool():
    img1, img2 = _render_pair(simple_scene_cuda(),
                              reference_cuda_camera(64, 48),
                              "cuda", REFERENCE_CUDA)
    np.testing.assert_allclose(img1, img2, atol=5e-5)


def test_three_secondary_copies():
    img1, img2 = _render_pair(huge_scene(0), reference_cpu_camera(64, 48),
                              "thinlens", DEFAULT, k_s=3)
    np.testing.assert_allclose(img1, img2, atol=5e-5)


def test_deterministic():
    scene = huge_scene(0)
    cam = reference_cpu_camera(48, 32)
    kw = dict(width=48, height=32, spp=2, max_depth=6,
              camera_mode="thinlens", options=DEFAULT,
              pool_size=3 * 8192)
    a = np.asarray(render_wavefront_dual(scene, cam, KEY, **kw))
    b = np.asarray(render_wavefront_dual(scene, cam, KEY, **kw))
    np.testing.assert_array_equal(a, b)


def test_depth_one_terminates_black_on_hit():
    # max_depth=1: no secondary pool work at all; hits contribute 0.
    scene = huge_scene(0)
    cam = reference_cpu_camera(48, 32)
    img1, img2 = _render_pair(scene, cam, "thinlens", DEFAULT,
                              w=48, h=32, spp=2, depth=1)
    np.testing.assert_allclose(img1, img2, atol=5e-5)


def test_odd_spp_and_size():
    # Non-multiple-of-task spp + image not a multiple of the tile edge.
    img1, img2 = _render_pair(huge_scene(0), reference_cpu_camera(50, 34),
                              "thinlens", DEFAULT, w=50, h=34, spp=3,
                              depth=5)
    np.testing.assert_allclose(img1, img2, atol=5e-5)


def test_list_kernel_full_list_matches_plain():
    scene = huge_scene(0)
    cx, cy, cz = (scene.centers[:, i] for i in range(3))
    r = scene.radii
    s = int(cx.shape[0])
    rows = 8
    o = jax.random.uniform(jax.random.key(7), (6, 16, 128),
                           minval=-1.0, maxval=1.0)
    rays = (o[0] * 10, o[1] * 2 + 2, o[2] * 10,
            o[3], o[4] * 0.5 - 0.1, o[5])
    h0, t0, s0 = segment_closest_hit(rays, cx, cy, cz, r, 1e-3, rows=rows)
    n_round = -(-s // UNROLL_LIST) * UNROLL_LIST
    lists = jnp.broadcast_to(
        jnp.where(jnp.arange(n_round) < s, jnp.arange(n_round), s),
        (2, n_round)).astype(jnp.int32)
    h1, t1, s1 = segment_closest_hit_list(
        rays, cx, cy, cz, r, jnp.full((2,), n_round, jnp.int32), lists,
        1e-3, rows=rows)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    hm = np.asarray(h0) > 0
    np.testing.assert_array_equal(np.asarray(s0)[hm], np.asarray(s1)[hm])


def test_list_kernel_restricted_list_matches_subscene():
    scene = huge_scene(0)
    cx, cy, cz = (scene.centers[:, i] for i in range(3))
    r = scene.radii
    s = int(cx.shape[0])
    rows = 8
    o = jax.random.uniform(jax.random.key(3), (6, 8, 128),
                           minval=-1.0, maxval=1.0)
    rays = (o[0] * 10, o[1] * 2 + 2, o[2] * 10,
            o[3], o[4] * 0.5 - 0.1, o[5])
    sub = np.sort(np.random.default_rng(0).choice(s, 40, replace=False))
    pad = -(-40 // UNROLL_LIST) * UNROLL_LIST
    lst = np.full((1, pad), s, np.int32)
    lst[:, :40] = sub
    h2, t2, s2 = segment_closest_hit_list(
        rays, cx, cy, cz, r, jnp.full((1,), pad, jnp.int32),
        jnp.asarray(lst), 1e-3, rows=rows)
    subj = jnp.asarray(sub)
    h3, t3, s3 = segment_closest_hit(
        rays, cx[subj], cy[subj], cz[subj], r[subj], 1e-3, rows=rows)
    hm = np.asarray(h3) > 0
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h3))
    np.testing.assert_array_equal(np.asarray(t2)[hm], np.asarray(t3)[hm])
    np.testing.assert_array_equal(np.asarray(s2)[hm],
                                  sub[np.asarray(s3)[hm]])


def test_rr_terminate_matches_single_pool():
    """Russian-roulette termination in the dual-pool engine: the draws
    (TAG_BOUNCE + depth, counter 2 on the ray key) and semantics are
    the single-pool engine's, so per-ray radiance is identical and the
    images agree to accumulation order -- closing the round-2 option-
    matrix gap where the dual engine raised on rr_terminate."""
    import dataclasses

    rr = dataclasses.replace(DEFAULT, rr_terminate=True, rr_start=2,
                             rr_scale=1.0)  # aggressive: many decisions
    img1, img2 = _render_pair(huge_scene(0), reference_cpu_camera(64, 48),
                              "thinlens", rr, spp=8, depth=10)
    np.testing.assert_allclose(img1, img2, atol=5e-5)
    # rr_start=1 additionally fires the PRIMARY-handoff decision (the
    # dual engine's depth-0 rr path), which rr_start=2 never reaches.
    rr1 = dataclasses.replace(rr, rr_start=1, rr_qmin=0.2)
    img3, img4 = _render_pair(huge_scene(0), reference_cpu_camera(64, 48),
                              "thinlens", rr1, spp=8, depth=10)
    np.testing.assert_allclose(img3, img4, atol=5e-5)
    # And the estimator actually terminates paths: it must differ from
    # the rr-off render beyond float noise.
    off1, _ = _render_pair(huge_scene(0), reference_cpu_camera(64, 48),
                           "thinlens", DEFAULT, spp=8, depth=10)
    assert np.abs(img1 - off1).max() > 1e-3


def test_stratified_sampling_matches_single_pool():
    """sampling='stratified' flows through the dual engine's camera-ray
    path identically (shared planar.camera_rays remap)."""
    import dataclasses

    strat = dataclasses.replace(DEFAULT, sampling="stratified")
    img1, img2 = _render_pair(huge_scene(0), reference_cpu_camera(64, 48),
                              "thinlens", strat, spp=8, depth=8)
    np.testing.assert_allclose(img1, img2, atol=5e-5)
