"""Dual-pool wavefront: coherence-split rendering for many-sphere scenes.

The single-pool engine (ops/wavefront.py) pays the full O(S) brute-force
sphere loop for EVERY segment (~8.5 ns/segment on v5e for the 489-sphere
huge scene) because its lanes mix camera rays with direction-scattered
bounce rays: no per-block bound can cull an incoherent block, and per-RAY
culling would need vector gathers the VPU does not have.

This engine splits the pools so coherence is an invariant, not an accident:

  PRIMARY pool  -- every lane issues one camera ray per iteration. Tasks
    map to pixels through a 32x32 tile swizzle (ops/cull.tile_pixel), and
    the granule-scrambled task order (a fixed coprime permutation of
    block-sized task granules -- pure index arithmetic) keeps each kernel
    block inside 2-4 adjacent tiles while the POOL as a whole works a
    spatial mix of image regions (sky and ground tiles simultaneously),
    so secondary load stays statistically level over the frame. Each
    block's rays fit a narrow bounding cone; the conservative cone +
    occlusion cull (ops/cull.py) shrinks its sphere loop to a per-block
    candidate LIST run by the list-driven Pallas kernel (measured ~6x
    fewer candidate tests than brute force under real drift).

  SECONDARY pool -- k_s stacked lane-aligned copies of the primary lane
    space running the plain brute-force megakernel. A primary lane's
    surviving scatter ray enters a two-deep per-lane handoff FIFO; one of
    its OWN k_s secondary lanes (same (row, lane), different copy) picks
    it up -- every transfer is a jnp.where select: ZERO cross-lane data
    movement, no compaction, no prefix sums (lane-crossing scans measured
    ~30 ms at 512k on v5e). Back-pressure (FIFO full) pauses that primary
    lane's issue; secondary acceptance itself NEVER stalls.

RETURN-CREDIT accumulation: a terminated path's radiance is added
directly to its feeder lane's task accumulator (lane-aligned again), and
an `outstanding` counter holds the task open until every handed-off path
lands. The framebuffer therefore sees exactly ONE scatter-add per task
(amortized over FLUSH_EVERY iterations); the secondary pool needs no
deposit machinery at all. Measured v1->v3 on v5e: the run/pending variant
stalled acceptance into 55% secondary occupancy; credits remove that
stall class entirely.

Radiance per (pixel, sample) is bit-identical to every other engine (the
ops/rng.py key contract and ops/planar.bounce_planar shading are shared);
only framebuffer accumulation order differs, as with the single pool.

Forward-only (lax.while_loop), single chip or per-shard under shard_map.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..config import TraceOptions
from ..models.camera import Camera
from ..models.scene import Scene
from . import cull
from .pallas_segment import (sphere_params_from_scene, trace_segment,
                             trace_segment_list)
from .planar import bounce_planar, camera_rays, strat0_scatter_planes

LANES = 128
ROWS = 64                    # kernel rows per block (both pools)
BLOCK = ROWS * LANES
TASK_SAMPLES = 64            # camera samples of one pixel per primary task
FLUSH_EVERY = 16
SECONDARY_COPIES = 2         # k_s: secondary lanes per primary lane


def dual_pool_lanes(pool_size: int, spp: int,
                    k_s: int = SECONDARY_COPIES) -> int:
    """Primary-pool lane count for a total lane budget (block-rounded)."""
    p = max(pool_size // (1 + k_s), BLOCK)
    return max(BLOCK, p // BLOCK * BLOCK)


def _granule_stride(n_g: int) -> int:
    """A fixed multiplier coprime to n_g near the golden ratio, so
    consecutive granules land far apart in the image."""
    if n_g <= 2:
        return 1
    k = max(1, round(n_g * 0.618))
    while math.gcd(k, n_g) != 1:
        k += 1
    return k


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
    from . import rng as _rng
    from . import threefry as _tf

    def _rr(keep, rk0, rk1, dep, nar, nag, nab):
        """Russian-roulette termination, bit-identical draws/semantics
        to the single-pool engines (ops/wavefront.py): TAG_BOUNCE +
        depth, counter 2; q = clip(rr_scale * max-channel(new
        attenuation), qmin, 1); survivors boost 1/q, casualties die
        like absorb. Returns (keep', boost)."""
        tag = jnp.uint32(_rng.TAG_BOUNCE) + dep.astype(jnp.uint32)
        u_rr, _ = _tf.draw_uniform2(rk0, rk1, tag, 2)
        q = jnp.clip(options.rr_scale
                     * jnp.maximum(nar, jnp.maximum(nag, nab)),
                     options.rr_qmin, 1.0)
        consider = keep & (dep + 1 >= options.rr_start)
        surv = consider & (u_rr < q)
        boost = jnp.where(surv, 1.0 / q, 1.0)
        return keep & (~consider | surv), boost

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

    # Granule-scrambled task order: the per-lane counters walk the
    # sequential space [0, n_g*BLOCK); granule g maps to (g*K) mod n_g.
    n_g = -(-n_tasks // BLOCK)
    n_seq = n_g * BLOCK
    gk = _granule_stride(n_g)

    sphere_params = sphere_params_from_scene(scene)
    lane = (jax.lax.broadcasted_iota(jnp.int32, (r_p, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (r_p, LANES), 1))
    lane0 = worker_index * p + lane
    stride = n_workers * p

    sky_bias = 0.5 if options.sky == "cuda" else 1.0
    unit_sample = options.scatter_sample == "unit"
    phys_refract = options.refract == "physical"
    FREE = jnp.int32(n_pixels)          # pending "empty" sentinel

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
        (it, nxt, task, sid, outs, accr, accg, accb, pp, pr, pg, pb,
         h0, h1,
         s_act, s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_ar, s_ag, s_ab,
         s_dep, s_pid, s_sid, met) = state
        (h0_val, h0_ox, h0_oy, h0_oz, h0_dx, h0_dy, h0_dz,
         h0_ar, h0_ag, h0_ab, h0_pid, h0_sid) = h0
        (h1_val, h1_ox, h1_oy, h1_oz, h1_dx, h1_dy, h1_dz,
         h1_ar, h1_ag, h1_ab, h1_pid, h1_sid) = h1

        # ---- secondary accept: free lanes pull their feeder's FIFO ----
        taken = jnp.zeros((r_p, LANES), bool)
        for j in range(k_s):
            free_j = ~copy_view(s_act, j)
            can = free_j & h0_val & ~taken
            s_ox = copy_set(s_ox, j, jnp.where(can, h0_ox,
                                               copy_view(s_ox, j)))
            s_oy = copy_set(s_oy, j, jnp.where(can, h0_oy,
                                               copy_view(s_oy, j)))
            s_oz = copy_set(s_oz, j, jnp.where(can, h0_oz,
                                               copy_view(s_oz, j)))
            s_dx = copy_set(s_dx, j, jnp.where(can, h0_dx,
                                               copy_view(s_dx, j)))
            s_dy = copy_set(s_dy, j, jnp.where(can, h0_dy,
                                               copy_view(s_dy, j)))
            s_dz = copy_set(s_dz, j, jnp.where(can, h0_dz,
                                               copy_view(s_dz, j)))
            s_ar = copy_set(s_ar, j, jnp.where(can, h0_ar,
                                               copy_view(s_ar, j)))
            s_ag = copy_set(s_ag, j, jnp.where(can, h0_ag,
                                               copy_view(s_ag, j)))
            s_ab = copy_set(s_ab, j, jnp.where(can, h0_ab,
                                               copy_view(s_ab, j)))
            s_dep = copy_set(s_dep, j, jnp.where(
                can, 1, copy_view(s_dep, j)))
            s_pid = copy_set(s_pid, j, jnp.where(
                can, h0_pid, copy_view(s_pid, j)))
            s_sid = copy_set(s_sid, j, jnp.where(
                can, h0_sid, copy_view(s_sid, j)))
            s_act = copy_set(s_act, j, copy_view(s_act, j) | can)
            taken = taken | can
        h0_val = h0_val & ~taken
        # FIFO shift: h1 moves into freed h0 slots.
        mv = ~h0_val & h1_val
        h0_val = h0_val | mv
        h1_val = h1_val & ~mv
        h0_ox = jnp.where(mv, h1_ox, h0_ox)
        h0_oy = jnp.where(mv, h1_oy, h0_oy)
        h0_oz = jnp.where(mv, h1_oz, h0_oz)
        h0_dx = jnp.where(mv, h1_dx, h0_dx)
        h0_dy = jnp.where(mv, h1_dy, h0_dy)
        h0_dz = jnp.where(mv, h1_dz, h0_dz)
        h0_ar = jnp.where(mv, h1_ar, h0_ar)
        h0_ag = jnp.where(mv, h1_ag, h0_ag)
        h0_ab = jnp.where(mv, h1_ab, h0_ab)
        h0_pid = jnp.where(mv, h1_pid, h0_pid)
        h0_sid = jnp.where(mv, h1_sid, h0_sid)

        # ---- primary task management ---------------------------------
        has_task = task >= 0
        acquire = ~has_task & (nxt < n_seq)
        task_seq = jnp.where(acquire, nxt, task)
        nxt = jnp.where(acquire, nxt + stride, nxt)
        # granule scramble: sequential counter -> spatial task id
        g = task_seq // BLOCK
        t_sp = (g * gk) % n_g * BLOCK + (task_seq - g * BLOCK)
        vp = t_sp // tpp
        run_start = (t_sp - vp * tpp) * task_samples
        run_end = jnp.minimum(run_start + task_samples, spp)
        pid, pvalid = cull.tile_pixel(vp, width, height)
        # virtual-padding tasks have no real pixel: drop them whole
        dead_task = acquire & (~pvalid | (t_sp >= n_tasks))
        task = jnp.where(dead_task, -1, task_seq)
        sid = jnp.where(acquire, run_start, sid)
        has_task = task >= 0

        fifo_room = ~h0_val | ~h1_val
        issue = has_task & ~dead_task & (sid < run_end) & fifo_room
        blocked_now = has_task & ~dead_task & ~issue

        ox, oy, oz, dx, dy, dz, rk0, rk1 = camera_rays(
            cam, pid, sid, base_key, width, height, camera_mode,
            sampling=options.sampling, spp=spp)

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
        strat0 = None
        if options.sampling == "stratified":
            # Every primary-pool shade IS bounce 0 (the depth plane
            # below is literal zeros), so the first-bounce stratified
            # substitution applies to the whole pool; secondaries
            # (depth >= 1 by construction) stay iid -- same contract as
            # the single-pool engines.
            from .threefry import key_words as _kw
            db0, db1 = _kw(base_key)
            strat0 = strat0_scatter_planes(rk0, rk1, pid, sid, db0, db1,
                                           spp, unit_sample)
        ndx, ndy, ndz, valid, sky_r, sky_g, sky_b = shade(
            seg, (dx, dy, dz), rk0, rk1, jnp.zeros_like(sid),
            strat0=strat0)

        miss_now = issue & ~hit
        accr = jnp.where(miss_now, accr + sky_r, accr)
        accg = jnp.where(miss_now, accg + sky_g, accg)
        accb = jnp.where(miss_now, accb + sky_b, accb)

        survive = issue & hit & valid & (max_depth > 1)
        if options.rr_terminate:
            survive, pboost = _rr(survive, rk0, rk1,
                                  jnp.zeros_like(sid), seg["ar"],
                                  seg["ag"], seg["ab"])
        else:
            pboost = 1.0
        to_h0 = survive & ~h0_val
        to_h1 = survive & h0_val          # issue guaranteed FIFO room
        h0_val = h0_val | to_h0
        h1_val = h1_val | to_h1

        def fifo_write(v0, v1, new):
            return (jnp.where(to_h0, new, v0), jnp.where(to_h1, new, v1))

        h0_ox, h1_ox = fifo_write(h0_ox, h1_ox, seg["px"])
        h0_oy, h1_oy = fifo_write(h0_oy, h1_oy, seg["py"])
        h0_oz, h1_oz = fifo_write(h0_oz, h1_oz, seg["pz"])
        h0_dx, h1_dx = fifo_write(h0_dx, h1_dx, ndx)
        h0_dy, h1_dy = fifo_write(h0_dy, h1_dy, ndy)
        h0_dz, h1_dz = fifo_write(h0_dz, h1_dz, ndz)
        h0_ar, h1_ar = fifo_write(h0_ar, h1_ar, seg["ar"] * pboost)
        h0_ag, h1_ag = fifo_write(h0_ag, h1_ag, seg["ag"] * pboost)
        h0_ab, h1_ab = fifo_write(h0_ab, h1_ab, seg["ab"] * pboost)
        h0_pid, h1_pid = fifo_write(h0_pid, h1_pid, pid)
        h0_sid, h1_sid = fifo_write(h0_sid, h1_sid, sid)
        outs = outs + survive.astype(jnp.int32)
        sid = jnp.where(issue, sid + 1, sid)

        # ---- secondary trace: brute-force megakernel -----------------
        s_rays = (s_ox, s_oy, s_oz, s_dx, s_dy, s_dz)
        sseg = trace_segment(s_rays, sphere_params, options.t_min,
                             rows=ROWS, active=s_act)
        s_hit = sseg["hit"] > 0
        s_rk0, s_rk1 = _ray_keys(base_key, s_pid, s_sid)
        sdx2, sdy2, sdz2, s_valid, sk_r, sk_g, sk_b = shade(
            sseg, (s_dx, s_dy, s_dz), s_rk0, s_rk1, s_dep)

        s_miss = s_act & ~s_hit
        s_scatter = s_act & s_hit & s_valid
        s_keep = s_scatter & (s_dep + 1 < max_depth)
        if options.rr_terminate:
            s_keep, sboost = _rr(s_keep, s_rk0, s_rk1, s_dep,
                                 s_ar * sseg["ar"], s_ag * sseg["ag"],
                                 s_ab * sseg["ab"])
        else:
            sboost = 1.0
        s_done = s_act & ~s_keep
        s_act_old = s_act

        # return credits: terminal radiance lands in the FEEDER's task
        # accumulator (lane-aligned); outstanding count drops.
        dec = jnp.zeros((r_p, LANES), jnp.int32)
        for j in range(k_s):
            dj = copy_view(s_done, j)
            mj = copy_view(s_miss, j)
            accr = accr + jnp.where(mj, copy_view(s_ar, j)
                                    * copy_view(sk_r, j), 0.0)
            accg = accg + jnp.where(mj, copy_view(s_ag, j)
                                    * copy_view(sk_g, j), 0.0)
            accb = accb + jnp.where(mj, copy_view(s_ab, j)
                                    * copy_view(sk_b, j), 0.0)
            dec = dec + dj.astype(jnp.int32)
        outs = outs - dec

        s_ox = jnp.where(s_keep, sseg["px"], s_ox)
        s_oy = jnp.where(s_keep, sseg["py"], s_oy)
        s_oz = jnp.where(s_keep, sseg["pz"], s_oz)
        s_dx = jnp.where(s_keep, sdx2, s_dx)
        s_dy = jnp.where(s_keep, sdy2, s_dy)
        s_dz = jnp.where(s_keep, sdz2, s_dz)
        s_ar = jnp.where(s_keep, s_ar * sseg["ar"] * sboost, s_ar)
        s_ag = jnp.where(s_keep, s_ag * sseg["ag"] * sboost, s_ag)
        s_ab = jnp.where(s_keep, s_ab * sseg["ab"] * sboost, s_ab)
        s_dep = jnp.where(s_keep, s_dep + 1, s_dep)
        s_act = s_keep

        # ---- task completion: all samples issued AND all paths home --
        done = has_task & (sid >= run_end) & (outs == 0) & (pp == FREE)
        pp = jnp.where(done, pid, pp)
        pr = jnp.where(done, accr, pr)
        pg = jnp.where(done, accg, pg)
        pb = jnp.where(done, accb, pb)
        accr = jnp.where(done, 0.0, accr)
        accg = jnp.where(done, 0.0, accg)
        accb = jnp.where(done, 0.0, accb)
        task = jnp.where(done, -1, task)

        if with_metrics:
            met = (met[0] + 1.0,
                   met[1] + issue.sum().astype(jnp.float32),
                   met[2] + s_act_old.sum().astype(jnp.float32),
                   met[3] + blocked_now.sum().astype(jnp.float32),
                   met[4] + counts.sum().astype(jnp.float32),
                   met[5] + taken.sum().astype(jnp.float32))
        h0 = (h0_val, h0_ox, h0_oy, h0_oz, h0_dx, h0_dy, h0_dz,
              h0_ar, h0_ag, h0_ab, h0_pid, h0_sid)
        h1 = (h1_val, h1_ox, h1_oy, h1_oz, h1_dx, h1_dy, h1_dz,
              h1_ar, h1_ag, h1_ab, h1_pid, h1_sid)
        return (it + 1, nxt, task, sid, outs, accr, accg, accb,
                pp, pr, pg, pb, h0, h1,
                s_act, s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_ar, s_ag,
                s_ab, s_dep, s_pid, s_sid, met)

    def cond(state):
        lane_state = state[0]
        nxt, task = lane_state[1], lane_state[2]
        return jnp.any(task >= 0) | jnp.any(nxt < n_seq)

    def epoch(state):
        # Framebuffer planes live only here (outer body): carrying them
        # through a per-iteration flush cond measured ~50-100us/iteration
        # of operand copies on v5e (see ops/wavefront.py's epoch note).
        lane_state, fbr, fbg, fbb = state
        lane_state = jax.lax.fori_loop(
            0, FLUSH_EVERY, lambda i, s: body(s), lane_state)
        pp, pr, pg, pb = lane_state[8:12]
        pp, pr, pg, pb, fbr, fbg, fbb = flush(pp, pr, pg, pb,
                                              fbr, fbg, fbb)
        lane_state = lane_state[:8] + (pp, pr, pg, pb) + lane_state[12:]
        return lane_state, fbr, fbg, fbb

    zp = jnp.zeros((r_p, LANES), jnp.float32)
    ip = jnp.zeros((r_p, LANES), jnp.int32)
    bp = jnp.zeros((r_p, LANES), bool)
    zs = jnp.zeros((r_s, LANES), jnp.float32)
    is_ = jnp.zeros((r_s, LANES), jnp.int32)
    bs = jnp.zeros((r_s, LANES), bool)
    fb0 = jnp.zeros((n_pixels,), jnp.float32)
    h_init = (bp, zp, zp, zp, zp + 1.0, zp, zp, zp, zp, zp, ip, ip)
    lane_state0 = (
        jnp.int32(0), lane0, ip - 1, ip, ip,      # it, nxt, task, sid, outs
        zp, zp, zp,                               # acc rgb
        ip + FREE, zp, zp, zp,                    # pending
        h_init, h_init,                           # handoff FIFO
        bs, zs, zs, zs, zs + 1.0, zs, zs,         # s act/o/d
        zs, zs, zs, is_, is_, is_,                # s att, dep, pid, sid
        tuple(jnp.float32(0.0) for _ in range(6)),  # metrics
    )
    final = jax.lax.while_loop(cond, epoch, (lane_state0, fb0, fb0, fb0))
    lane_state, fbr, fbg, fbb = final
    (pp, pr, pg, pb) = lane_state[8:12]
    _, _, _, _, fbr, fbg, fbb = flush(pp, pr, pg, pb, fbr, fbg, fbb)
    fb = jnp.stack([fbr, fbg, fbb], axis=-1)
    if not with_metrics:
        return fb
    met = lane_state[27]
    return fb, {
        "iterations": met[0], "issue_lane_iters": met[1],
        "secondary_active_lane_iters": met[2],
        "primary_blocked_lane_iters": met[3],
        "primary_candidate_total": met[4], "handoffs": met[5],
        "p_lanes": jnp.float32(p), "s_lanes": jnp.float32(k_s * p),
    }


def _ray_keys(base_key, pid, sid):
    """Per-(pixel, sample) key-word planes: the ops/rng.py ray_key chain."""
    from .planar import ray_key_words

    return ray_key_words(base_key, pid, sid)


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
