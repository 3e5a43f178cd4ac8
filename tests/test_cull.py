"""Conservative-culling guarantees for the dual-pool primary pass.

The cull may only ever REMOVE spheres that provably cannot win the
closest-hit running min: every brute-force winner must appear in the
candidate list of its block (else the dual-pool engine would render a
different image, not a slower one -- so these tests are the safety net
for ops/wavefront_dual.py's headline path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracinginoneweekend_tpu.models.camera import reference_cpu_camera
from raytracinginoneweekend_tpu.models.scene import huge_scene
from raytracinginoneweekend_tpu.ops import cull
from raytracinginoneweekend_tpu.ops.planar import camera_rays

W, H = 1200, 800
T_MIN = 1e-3
ROWS = 64
LANES = 128


def _winners(rays_np, cxn, cyn, czn, rn):
    ox, oy, oz, dx, dy, dz = [v[:, None].astype(np.float64)
                              for v in rays_np]
    ocx, ocy, ocz = ox - cxn[None], oy - cyn[None], oz - czn[None]
    a = dx * dx + dy * dy + dz * dz
    b = ocx * dx + ocy * dy + ocz * dz
    c = ocx ** 2 + ocy ** 2 + ocz ** 2 - (rn ** 2)[None]
    disc = b * b - a * c
    sq = np.sqrt(np.maximum(disc, 0.0))
    q0, q1 = -b - sq, -b + sq
    q = np.where((disc > 0) & (q0 > T_MIN * a), q0,
                 np.where((disc > 0) & (q1 > T_MIN * a), q1, np.inf))
    win = np.argmin(q, axis=1)
    hit = np.isfinite(q.min(axis=1))
    return set(np.unique(win[hit]).tolist())


@pytest.fixture(scope="module")
def geo():
    scene = huge_scene(0)
    return (scene.centers[:, 0], scene.centers[:, 1],
            scene.centers[:, 2], scene.radii)


def test_tile_pixel_bijection():
    _, _, n_vp = cull.virtual_grid(W, H)
    pid, valid = cull.tile_pixel(jnp.arange(n_vp), W, H)
    pids = np.asarray(pid)[np.asarray(valid)]
    assert len(pids) == W * H
    assert len(np.unique(pids)) == W * H


def test_camera_blocks_conservative_and_tight(geo):
    cx, cy, cz, r = geo
    cxn, cyn, czn, rn = (np.asarray(v) for v in geo)
    cam = reference_cpu_camera(W, H)
    key = jax.random.key(0)
    _, _, n_vp = cull.virtual_grid(W, H)
    tpp = 4
    n_tasks = n_vp * tpp
    rng = np.random.default_rng(3)
    counts_seen = []
    for _ in range(12):
        base = int(rng.integers(0, n_tasks - ROWS * LANES))
        tasks = base + np.arange(ROWS * LANES)
        vp = tasks // tpp
        sid = (tasks - vp * tpp) * 32 + int(rng.integers(0, 32))
        pid, valid = cull.tile_pixel(
            jnp.asarray(vp.reshape(ROWS, LANES)), W, H)
        rays = camera_rays(cam, pid,
                           jnp.asarray(sid.reshape(ROWS, LANES),
                                       jnp.int32),
                           key, W, H, "thinlens")[:6]
        stats = cull.block_cone_stats(valid, rays, ROWS)
        counts, lists = cull.candidate_lists(stats, cx, cy, cz, r, T_MIN)
        cnt = int(counts[0])
        lst = set(np.asarray(lists)[0, :cnt].tolist())
        act = np.asarray(valid).ravel()
        rays_np = [np.asarray(v).ravel()[act] for v in rays]
        win = _winners(rays_np, cxn, cyn, czn, rn)
        assert win <= lst, f"culled true winners: {sorted(win - lst)}"
        counts_seen.append(cnt)
    # Tightness: coherent camera blocks must cull hard on average.
    assert np.median(counts_seen) < 64, counts_seen


def test_incoherent_block_keeps_everything(geo):
    cx, cy, cz, r = geo
    s = int(cx.shape[0])
    o = jax.random.uniform(jax.random.key(9), (6, ROWS, 128),
                           minval=-1.0, maxval=1.0)
    rays = (o[0] * 10, o[1] * 2 + 2, o[2] * 10, o[3], o[4], o[5])
    stats = cull.block_cone_stats(jnp.ones((ROWS, 128), bool), rays, ROWS)
    counts, _ = cull.candidate_lists(stats, cx, cy, cz, r, T_MIN)
    assert int(counts[0]) >= s


def test_empty_block_zero_count(geo):
    cx, cy, cz, r = geo
    o = jax.random.uniform(jax.random.key(9), (6, ROWS, 128))
    rays = tuple(o[i] for i in range(6))
    stats = cull.block_cone_stats(jnp.zeros((ROWS, 128), bool), rays,
                                  ROWS)
    counts, _ = cull.candidate_lists(stats, cx, cy, cz, r, T_MIN)
    assert int(counts[0]) == 0
