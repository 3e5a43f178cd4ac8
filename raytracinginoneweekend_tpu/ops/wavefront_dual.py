"""Dual-pool wavefront: coherence-split rendering for many-sphere scenes.

The single-pool engine (ops/wavefront.py) pays the full O(S) brute-force
sphere loop for EVERY segment (~8.5 ns/segment on v5e for the 489-sphere
huge scene) because its lanes mix camera rays with direction-scattered
bounce rays: no per-block bound can cull for an incoherent block, and
per-RAY culling would need vector gathers the VPU does not have.

This engine splits the pools so coherence is an invariant, not an accident:

  PRIMARY pool  -- every lane issues one camera ray per iteration. Tasks
    map to pixels through a 32x32 tile swizzle (ops/cull.tile_pixel), so
    each kernel block's rays fit a narrow bounding cone. A conservative
    cone + occlusion cull (ops/cull.py) computed on the XLA side shrinks
    each block's sphere loop to a per-block candidate LIST -- measured
    mean ~3-25 of 489 candidates -- run by the list-driven Pallas kernel
    (ops/pallas_segment.segment_closest_hit_list). Misses resolve to sky
    into per-task accumulator registers exactly like the single pool.

  SECONDARY pool -- k_s stacked lane-aligned copies of the primary lane
    space running the plain brute-force megakernel. A primary lane's
    surviving scatter ray is handed to one of ITS OWN k_s secondary
    lanes (same (row, lane) position, different copy): the handoff is a
    pure jnp.where select -- ZERO cross-lane data movement, no
    compaction, no prefix sums (lane-crossing scans measured ~30 ms at
    512k on v5e). Back-pressure (all k_s copies busy) simply pauses that
    primary lane's issue for a few iterations.

Radiance per (pixel, sample) is bit-identical to every other engine (the
ops/rng.py key contract and ops/planar.bounce_planar shading are shared);
only framebuffer accumulation order differs, as with the single pool.

Deposit paths (all scatter-adds amortized, v5e scatter costs ~6.5 ns x
call size):
  * primary task accumulators (sky of misses) -> pending slot on task
    completion -> periodic flush;
  * each secondary lane accumulates consecutive same-pixel path results
    in a run register (its feeder lane works one pixel for
    task_samples consecutive issues, so runs are long) -> pending on
    pixel change -> periodic flush.

Forward-only (lax.while_loop), single chip or per-shard under shard_map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import TraceOptions
from ..models.camera import Camera
from ..models.scene import Scene
from . import cull
from .pallas_segment import (sphere_params_from_scene, trace_segment,
                             trace_segment_list)
from .planar import bounce_planar, camera_rays

LANES = 128
ROWS = 64                    # kernel rows per block (both pools)
BLOCK = ROWS * LANES
TASK_SAMPLES = 32            # camera samples of one pixel per primary task
FLUSH_EVERY = 32             # task runs are 32+ iterations; flush rarely
SECONDARY_COPIES = 2         # k_s: secondary lanes per primary lane


def dual_pool_lanes(pool_size: int, spp: int,
                    k_s: int = SECONDARY_COPIES) -> int:
    """Primary-pool lane count for a total lane budget (block-rounded)."""
    p = max(pool_size // (1 + k_s), BLOCK)
    return max(BLOCK, p // BLOCK * BLOCK)


def wavefront_dual_fb(scene: Scene, cam: Camera, base_key, *, width: int,
                      height: int, spp: int, max_depth: int,
                      camera_mode: str, options: TraceOptions,
                      pool_size: int = 1 << 16,
                      k_s: int = SECONDARY_COPIES,
                      worker_index=0, n_workers: int = 1,
                      with_metrics: bool = False):
    """Trace this worker's task chunks -> UNNORMALIZED (H*W, 3) fb sums.

    with_metrics=True additionally returns an occupancy/stall dict
    (iterations, issue/active/blocked lane-iteration sums, candidate
    totals) for performance diagnosis.
    """
    n_pixels = width * height
    _, _, n_vp = cull.virtual_grid(width, height)
    task_samples = min(TASK_SAMPLES, spp)
    tpp = -(-spp // task_samples)
    n_tasks = n_vp * tpp
    if n_vp * spp >= 2 ** 31:
        raise ValueError(
            f"{width}x{height} @ {spp}spp overflows the int32 ray-id "
            "space; render in passes (split spp and average)")
    p = dual_pool_lanes(pool_size, spp, k_s)
    r_p = p // LANES                    # primary rows
    r_s = k_s * r_p                     # secondary rows (stacked copies)

    sphere_params = sphere_params_from_scene(scene)
    lane = (jax.lax.broadcasted_iota(jnp.int32, (r_p, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (r_p, LANES), 1))
    lane0 = worker_index * p + lane
    stride = n_workers * p

    sky_bias = 0.5 if options.sky == "cuda" else 1.0
    unit_sample = options.scatter_sample == "unit"
    phys_refract = options.refract == "physical"
    FREE = jnp.int32(n_pixels)          # pending/run "empty" sentinel

    shade = functools.partial(bounce_planar, unit_sample=unit_sample,
                              phys_refract=phys_refract, sky_bias=sky_bias)

    def flush(pp, pr, pg, pb, fbr, fbg, fbb):
        ppf = pp.reshape(-1)
        fbr = fbr.at[ppf].add(pr.reshape(-1), mode="drop")
        fbg = fbg.at[ppf].add(pg.reshape(-1), mode="drop")
        fbb = fbb.at[ppf].add(pb.reshape(-1), mode="drop")
        free = jnp.full_like(pp, FREE)
        zero = jnp.zeros_like(pr)
        return free, zero, zero, zero, fbr, fbg, fbb

    def copy_view(v, j):
        return jax.lax.dynamic_slice_in_dim(v, j * r_p, r_p, axis=0)

    def copy_set(v, j, new):
        return jax.lax.dynamic_update_slice_in_dim(v, new, j * r_p, axis=0)

    def body(state):
        (it, nxt, task, sid, accr, accg, accb, pp, pr, pg, pb,
         h_val, h_ox, h_oy, h_oz, h_dx, h_dy, h_dz, h_ar, h_ag, h_ab,
         h_pid, h_sid,
         s_act, s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_ar, s_ag, s_ab,
         s_dep, s_pid, s_sid, run_pid, run_r, run_g, run_b,
         s_pp, s_pr, s_pg, s_pb, fbr, fbg, fbb, met) = state

        # ---- periodic pending flush (both pools) ----------------------
        do_flush = it % FLUSH_EVERY == FLUSH_EVERY - 1
        pp, pr, pg, pb, fbr, fbg, fbb = jax.lax.cond(
            do_flush, lambda o: flush(*o), lambda o: o,
            (pp, pr, pg, pb, fbr, fbg, fbb))
        s_pp, s_pr, s_pg, s_pb, fbr, fbg, fbb = jax.lax.cond(
            do_flush, lambda o: flush(*o), lambda o: o,
            (s_pp, s_pr, s_pg, s_pb, fbr, fbg, fbb))

        # ---- secondary accept: free lanes pull their feeder's handoff -
        taken = jnp.zeros((r_p, LANES), bool)
        for j in range(k_s):
            free_j = ~copy_view(s_act, j)
            rp_j = copy_view(run_pid, j)
            rr_j = copy_view(run_r, j)
            rg_j = copy_view(run_g, j)
            rb_j = copy_view(run_b, j)
            spp_j = copy_view(s_pp, j)
            merge = rp_j == h_pid
            can_push = spp_j == FREE
            can = free_j & h_val & ~taken & (
                merge | (rp_j == FREE) | can_push)
            push = can & ~merge & (rp_j != FREE)
            # park the finished run in the pending slot
            s_pp = copy_set(s_pp, j, jnp.where(push, rp_j, spp_j))
            s_pr = copy_set(s_pr, j, jnp.where(
                push, rr_j, copy_view(s_pr, j)))
            s_pg = copy_set(s_pg, j, jnp.where(
                push, rg_j, copy_view(s_pg, j)))
            s_pb = copy_set(s_pb, j, jnp.where(
                push, rb_j, copy_view(s_pb, j)))
            fresh = can & ~merge
            run_pid = copy_set(run_pid, j, jnp.where(can, h_pid, rp_j))
            run_r = copy_set(run_r, j, jnp.where(fresh, 0.0, rr_j))
            run_g = copy_set(run_g, j, jnp.where(fresh, 0.0, rg_j))
            run_b = copy_set(run_b, j, jnp.where(fresh, 0.0, rb_j))
            # load the ray
            s_ox = copy_set(s_ox, j, jnp.where(can, h_ox,
                                               copy_view(s_ox, j)))
            s_oy = copy_set(s_oy, j, jnp.where(can, h_oy,
                                               copy_view(s_oy, j)))
            s_oz = copy_set(s_oz, j, jnp.where(can, h_oz,
                                               copy_view(s_oz, j)))
            s_dx = copy_set(s_dx, j, jnp.where(can, h_dx,
                                               copy_view(s_dx, j)))
            s_dy = copy_set(s_dy, j, jnp.where(can, h_dy,
                                               copy_view(s_dy, j)))
            s_dz = copy_set(s_dz, j, jnp.where(can, h_dz,
                                               copy_view(s_dz, j)))
            s_ar = copy_set(s_ar, j, jnp.where(can, h_ar,
                                               copy_view(s_ar, j)))
            s_ag = copy_set(s_ag, j, jnp.where(can, h_ag,
                                               copy_view(s_ag, j)))
            s_ab = copy_set(s_ab, j, jnp.where(can, h_ab,
                                               copy_view(s_ab, j)))
            s_dep = copy_set(s_dep, j, jnp.where(
                can, 1, copy_view(s_dep, j)))
            s_pid = copy_set(s_pid, j, jnp.where(
                can, h_pid, copy_view(s_pid, j)))
            s_sid = copy_set(s_sid, j, jnp.where(
                can, h_sid, copy_view(s_sid, j)))
            s_act = copy_set(s_act, j, copy_view(s_act, j) | can)
            taken = taken | can
        h_val = h_val & ~taken

        # ---- primary issue -------------------------------------------
        has_task = task >= 0
        acquire = ~h_val & ~has_task & (nxt < n_tasks)
        task_new = jnp.where(acquire, nxt, task)
        nxt = jnp.where(acquire, nxt + stride, nxt)
        vp = task_new // tpp
        run_start = (task_new - vp * tpp) * task_samples
        run_end = jnp.minimum(run_start + task_samples, spp)
        pid, pvalid = cull.tile_pixel(vp, width, height)
        # virtual-padding tasks have no real pixel: drop them whole
        dead_task = acquire & ~pvalid
        task = jnp.where(dead_task, -1, task_new)
        sid = jnp.where(acquire, run_start, sid)
        has_task = task >= 0
        last = sid + 1 >= run_end
        issue = (~h_val & has_task & ~dead_task
                 & (~last | (pp == FREE)))
        blocked_now = has_task & ~dead_task & ~issue

        ox, oy, oz, dx, dy, dz, rkey = camera_rays(
            cam, pid, sid, base_key, width, height, camera_mode)

        # ---- primary trace: cone cull + list kernel ------------------
        stats = cull.block_cone_stats(issue, (ox, oy, oz, dx, dy, dz),
                                      ROWS)
        cx, cy, cz, radii = sphere_params[:4]
        counts, lists = cull.candidate_lists(stats, cx, cy, cz, radii,
                                             options.t_min)
        seg = trace_segment_list((ox, oy, oz, dx, dy, dz), sphere_params,
                                 counts, lists, options.t_min, rows=ROWS,
                                 active=issue)
        hit = seg["hit"] > 0
        ndx, ndy, ndz, valid, sky_r, sky_g, sky_b = shade(
            seg, (dx, dy, dz), rkey, jnp.zeros_like(sid))

        miss_now = issue & ~hit
        accr = jnp.where(miss_now, accr + sky_r, accr)
        accg = jnp.where(miss_now, accg + sky_g, accg)
        accb = jnp.where(miss_now, accb + sky_b, accb)

        survive = issue & hit & valid & (max_depth > 1)
        h_val = h_val | survive
        h_ox = jnp.where(survive, seg["px"], h_ox)
        h_oy = jnp.where(survive, seg["py"], h_oy)
        h_oz = jnp.where(survive, seg["pz"], h_oz)
        h_dx = jnp.where(survive, ndx, h_dx)
        h_dy = jnp.where(survive, ndy, h_dy)
        h_dz = jnp.where(survive, ndz, h_dz)
        h_ar = jnp.where(survive, seg["ar"], h_ar)
        h_ag = jnp.where(survive, seg["ag"], h_ag)
        h_ab = jnp.where(survive, seg["ab"], h_ab)
        h_pid = jnp.where(survive, pid, h_pid)
        h_sid = jnp.where(survive, sid, h_sid)

        done = issue & last
        pp = jnp.where(done, pid, pp)
        pr = jnp.where(done, accr, pr)
        pg = jnp.where(done, accg, pg)
        pb = jnp.where(done, accb, pb)
        accr = jnp.where(done, 0.0, accr)
        accg = jnp.where(done, 0.0, accg)
        accb = jnp.where(done, 0.0, accb)
        task = jnp.where(done, -1, task)
        sid = jnp.where(issue & ~last, sid + 1, sid)

        # ---- secondary trace: brute-force megakernel -----------------
        s_rays = (s_ox, s_oy, s_oz, s_dx, s_dy, s_dz)
        sseg = trace_segment(s_rays, sphere_params, options.t_min,
                             rows=ROWS, active=s_act)
        s_hit = sseg["hit"] > 0
        s_rkey = _ray_keys(base_key, s_pid, s_sid)
        sdx2, sdy2, sdz2, s_valid, sk_r, sk_g, sk_b = shade(
            sseg, (s_dx, s_dy, s_dz), s_rkey, s_dep)

        s_miss = s_act & ~s_hit
        run_r = jnp.where(s_miss, run_r + s_ar * sk_r, run_r)
        run_g = jnp.where(s_miss, run_g + s_ag * sk_g, run_g)
        run_b = jnp.where(s_miss, run_b + s_ab * sk_b, run_b)

        s_scatter = s_act & s_hit & s_valid
        s_keep = s_scatter & (s_dep + 1 < max_depth)
        s_ox = jnp.where(s_keep, sseg["px"], s_ox)
        s_oy = jnp.where(s_keep, sseg["py"], s_oy)
        s_oz = jnp.where(s_keep, sseg["pz"], s_oz)
        s_dx = jnp.where(s_keep, sdx2, s_dx)
        s_dy = jnp.where(s_keep, sdy2, s_dy)
        s_dz = jnp.where(s_keep, sdz2, s_dz)
        s_ar = jnp.where(s_keep, s_ar * sseg["ar"], s_ar)
        s_ag = jnp.where(s_keep, s_ag * sseg["ag"], s_ag)
        s_ab = jnp.where(s_keep, s_ab * sseg["ab"], s_ab)
        s_dep = jnp.where(s_keep, s_dep + 1, s_dep)
        s_act_old = s_act
        s_act = s_keep

        if with_metrics:
            met = (met[0] + 1.0,
                   met[1] + issue.sum().astype(jnp.float32),
                   met[2] + s_act_old.sum().astype(jnp.float32),
                   met[3] + blocked_now.sum().astype(jnp.float32),
                   met[4] + counts.sum().astype(jnp.float32),
                   met[5] + taken.sum().astype(jnp.float32))
        return (it + 1, nxt, task, sid, accr, accg, accb, pp, pr, pg, pb,
                h_val, h_ox, h_oy, h_oz, h_dx, h_dy, h_dz, h_ar, h_ag,
                h_ab, h_pid, h_sid,
                s_act, s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_ar, s_ag,
                s_ab, s_dep, s_pid, s_sid, run_pid, run_r, run_g, run_b,
                s_pp, s_pr, s_pg, s_pb, fbr, fbg, fbb, met)

    def cond(state):
        it, nxt, task = state[0], state[1], state[2]
        h_val, s_act = state[11], state[23]
        return (jnp.any(task >= 0) | jnp.any(nxt < n_tasks)
                | jnp.any(h_val) | jnp.any(s_act))

    zp = jnp.zeros((r_p, LANES), jnp.float32)
    ip = jnp.zeros((r_p, LANES), jnp.int32)
    bp = jnp.zeros((r_p, LANES), bool)
    zs = jnp.zeros((r_s, LANES), jnp.float32)
    is_ = jnp.zeros((r_s, LANES), jnp.int32)
    bs = jnp.zeros((r_s, LANES), bool)
    fb0 = jnp.zeros((n_pixels,), jnp.float32)
    state0 = (
        jnp.int32(0), lane0, ip - 1, ip,          # it, nxt, task, sid
        zp, zp, zp,                               # acc rgb
        ip + FREE, zp, zp, zp,                    # pending
        bp, zp, zp, zp, zp + 1.0, zp, zp,         # handoff val/o/d
        zp, zp, zp, ip, ip,                       # h att, h pid, h sid
        bs, zs, zs, zs, zs + 1.0, zs, zs,         # s act/o/d
        zs, zs, zs, is_, is_, is_,                # s att, dep, pid, sid
        is_ + FREE, zs, zs, zs,                   # run pid/rgb
        is_ + FREE, zs, zs, zs,                   # s pending
        fb0, fb0, fb0,
        tuple(jnp.float32(0.0) for _ in range(6)),  # metrics
    )
    final = jax.lax.while_loop(cond, body, state0)
    (pp, pr, pg, pb) = final[7:11]
    (run_pid, run_r, run_g, run_b) = final[36:40]
    (s_pp, s_pr, s_pg, s_pb) = final[40:44]
    fbr, fbg, fbb = final[44:47]
    _, _, _, _, fbr, fbg, fbb = flush(pp, pr, pg, pb, fbr, fbg, fbb)
    _, _, _, _, fbr, fbg, fbb = flush(s_pp, s_pr, s_pg, s_pb,
                                      fbr, fbg, fbb)
    _, _, _, _, fbr, fbg, fbb = flush(run_pid, run_r, run_g, run_b,
                                      fbr, fbg, fbb)
    fb = jnp.stack([fbr, fbg, fbb], axis=-1)
    if not with_metrics:
        return fb
    met = final[47]
    return fb, {
        "iterations": met[0], "issue_lane_iters": met[1],
        "secondary_active_lane_iters": met[2],
        "primary_blocked_lane_iters": met[3],
        "primary_candidate_total": met[4], "handoffs": met[5],
        "p_lanes": jnp.float32(p), "s_lanes": jnp.float32(k_s * p),
    }


def _ray_keys(base_key, pid, sid):
    """Per-(pixel, sample) key plane: the ops/rng.py ray_key contract."""
    from .planar import fold, fold_base

    return fold(fold_base(base_key, pid), sid)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "camera_mode",
                     "options", "pool_size", "k_s"))
def render_wavefront_dual(scene: Scene, cam: Camera, base_key, *,
                          width: int, height: int, spp: int,
                          max_depth: int, camera_mode: str,
                          options: TraceOptions, pool_size: int = 1 << 16,
                          k_s: int = SECONDARY_COPIES):
    """Render the full image -> (H*W, 3) linear radiance means (1 chip)."""
    fb = wavefront_dual_fb(scene, cam, base_key, width=width,
                           height=height, spp=spp, max_depth=max_depth,
                           camera_mode=camera_mode, options=options,
                           pool_size=pool_size, k_s=k_s)
    return fb / spp
