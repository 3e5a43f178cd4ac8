"""Fused shade+regen Pallas kernel: the wavefront engine's whole
elementwise tier in ONE program per iteration.

The measured composition of the headline frame (see ARCHITECTURE.md) is
~50% closest-hit kernel, ~22% flush scatters, ~28% XLA elementwise
(material shade + RNG draws ~300 ms/frame, lane regeneration + camera
rays ~250 ms/frame, winner-param resolve ~180 ms). The whole-bounce
megakernel (ops/pallas_mega.py) tried to absorb the resolve INTO the
kernel and lost: 64 small per-row (16,S)@(S,128) matmuls serialize
against the VPU (+590 ms kernel vs -520 ms XLA). This module keeps the
XLA-side MXU one-hot resolve (pallas_segment.resolve_params -- one big
efficient matmul) and fuses everything AROUND it instead:

  iteration = closest-hit kernel -> XLA one-hot resolve
              -> [THIS KERNEL: surface math + RNG draws + material
                  scatter + state update + task regeneration + camera
                  rays for re-issued lanes]

To make shade and regen ADJACENT (one fusable program), the loop body is
ROTATED vs ops/wavefront.py's regen-then-trace order: the kernel shades
the segment that was just traced, then immediately regenerates dead
lanes for the NEXT iteration; a one-time prologue regen issues the
initial rays. Per-ray semantics are identical (the RNG contract keys
every draw by (pixel, sample, bounce), not by engine iteration), so the
engines agree to float-accumulation order.

Lane state is ops/wavefront.py's 19 + 4*n_slots planes: the per-ray
threefry key words (k0, k1) are CARRIED instead of recomputed each
iteration (they only change when a lane re-issues, and the XLA path's
recompute-from-(pid, sid) is bit-identical -- tests/test_wavefront.py),
and each pending slot stores the finished TASK id (-1 = free) so the
epoch flush can deposit into the task-indexed ledger.

Camera-ray math mirrors ops/planar.camera_rays (all four modes, quirks
Q1/Q2/Q11); camera constants arrive as one (19,) SMEM vector. Reference
semantics: camera.hxx:24-57, cuda_impl.cu:101-121 (modes), materials as
ops/pallas_mega.kernel_shade.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rng as _rng
from . import threefry as tf
from .pallas_mega import TAG_BOUNCE, kernel_bounce_draws, kernel_shade

LANES = 128
TAG_JITTER = 0  # ops/rng.py
TAG_LENS = 1
TWO_PI = 6.283185307179586

N_BASE = 19  # must match ops/wavefront.py's lane-state layout
ACT = 3      # index of the `active` plane within the state

# A/B experiment knob (VERDICT r4 #6, scripts/bench_strat0.py): "off"
# disables the bounce-0 stratified-scatter substitution at SHADE time,
# isolating its recompute cost on the toolbox bench arm -- the measured
# UPPER BOUND on what an at-regen substitution (+3 state planes) could
# recover. Estimator-changing; never set outside the experiment.
import os as _os
import sys as _sys

_STRAT0_MODE = _os.environ.get("RTW_STRAT0_MODE", "recompute")
if _STRAT0_MODE not in ("recompute", "off"):
    raise ValueError(
        f"RTW_STRAT0_MODE={_STRAT0_MODE!r}: expected 'recompute' or 'off'")
if _STRAT0_MODE == "off":  # loud: this changes the stratified estimator
    print("pallas_fused: RTW_STRAT0_MODE=off -- bounce-0 stratified "
          "substitution DISABLED (timing ablation; estimator-changing)",
          file=_sys.stderr)


def pack_camera(cam):
    """Camera -> (19,) f32 scalar vector for SMEM prefetch."""
    return jnp.concatenate([
        cam.origin, cam.lower_left, cam.horizontal, cam.vertical,
        cam.basis_u, cam.basis_v,
        jnp.reshape(cam.lens_radius, (1,))]).astype(jnp.float32)


def _kernel_shade_regen(
        cam_ref, bk_ref, wb_ref,  # SMEM: (19,) f32 camera, (2,) u32 base
        *refs,                    # key, (1,) i32 worker task base
        rows: int, max_depth: int, unit_sample: bool,
        phys_refract: bool, sky_bias: float, width: int, height: int,
        spp: int, task_samples: int, tpp: int, n_tasks: int,
        n_slots: int, stride: int, camera_mode: str,
        rr_terminate: bool = False, rr_start: int = 3,
        rr_qmin: float = 0.05, rr_scale: float = 1.0,
        own_bl: int = 0, t_b: int = 0,
        tiles_x: int = 0, tile: int = 32, sampling: str = "iid"):
    # refs = [hit, t, 10 resolved params, state (19 + 4*n_slots)] inputs
    # followed by the (19 + 4*n_slots) state outputs.
    # own_bl > 0 selects TILE ownership (ops/wavefront.py): the lane's
    # task range ends at its ownership block's bound instead of n_tasks,
    # and task ids map to pixels through the 32x32 tile swizzle
    # (ops/cull.py tile_pixel, inlined in integer arithmetic).
    n_state = N_BASE + 4 * n_slots
    ins = refs[:12 + n_state]
    outs = refs[12 + n_state:]
    hit_ref, t_ref = ins[0], ins[1]
    (chx_ref, chy_ref, chz_ref, rh_ref, mt_ref,
     alr_ref, alg_ref, alb_ref, fz_ref, io_ref) = ins[2:12]
    st = ins[12:]

    if own_bl:
        local_lane = (pl.program_id(0) * (rows * LANES)
                      + jax.lax.broadcasted_iota(
                          jnp.int32, (rows, LANES), 0) * LANES
                      + jax.lax.broadcasted_iota(
                          jnp.int32, (rows, LANES), 1))
        block_end = wb_ref[0] + (local_lane // own_bl + 1) * t_b
    else:
        block_end = n_tasks

    live = (jnp.any(st[ACT][:] > 0) | jnp.any(st[1][:] >= 0)
            | jnp.any(st[0][:] < block_end))

    @pl.when(jnp.logical_not(live))
    def _():
        # Fully-drained block (no active rays, no tasks, ownership
        # exhausted): pure passthrough while sibling blocks finish.
        for i, (iref, oref) in enumerate(zip(st, outs)):
            if i == ACT:
                oref[:] = jnp.zeros((rows, LANES), jnp.int32)
            else:
                oref[:] = iref[:]

    @pl.when(live)
    def _():
        nxt = st[0][:]
        task = st[1][:]
        sid = st[2][:]
        active = st[ACT][:] > 0
        ox, oy, oz = st[4][:], st[5][:], st[6][:]
        dx, dy, dz = st[7][:], st[8][:], st[9][:]
        ax, ay, az = st[10][:], st[11][:], st[12][:]
        dep = st[13][:]
        acr, acg, acb = st[14][:], st[15][:], st[16][:]
        k0, k1 = st[17][:], st[18][:]
        slots = [tuple(st[N_BASE + 4 * j + i][:] for i in range(4))
                 for j in range(n_slots)]

        def vp_to_pid(vp):
            """Virtual pixel -> row-major pid (tile de-swizzle when
            own_bl; ops/cull.py tile_pixel inlined). Shared by the
            shade tier (current task) and regen (new task)."""
            if not own_bl:
                return vp
            vp_c = jnp.maximum(vp, 0)
            t_id = vp_c // (tile * tile)
            o = vp_c - t_id * (tile * tile)
            ty = t_id // tiles_x
            txx = t_id - ty * tiles_x
            oy_t = o // tile
            ox_t = o - oy_t * tile
            yp_ = ty * tile + oy_t
            xp_ = txx * tile + ox_t
            pvalid_ = (xp_ < width) & (yp_ < height)
            yp_ = jnp.where(pvalid_, yp_, 0)
            xp_ = jnp.where(pvalid_, xp_, 0)
            return yp_ * width + xp_

        # ---- shade the segment just traced (= wavefront.segment) -----
        hit = hit_ref[:] > 0
        t_safe = jnp.where(hit, t_ref[:], 1.0)
        px = ox + t_safe * dx
        py = oy + t_safe * dy
        pz = oz + t_safe * dz
        rh = rh_ref[:]
        inv_r = 1.0 / jnp.where(rh != 0.0, rh, 1.0)
        nx = (px - chx_ref[:]) * inv_r
        ny = (py - chy_ref[:]) * inv_r
        nz = (pz - chz_ref[:]) * inv_r

        draws = kernel_bounce_draws(k0, k1, dep, unit_sample=unit_sample)
        if sampling == "stratified" and _STRAT0_MODE != "off":
            # First-bounce stratified scatter: the CURRENT ray's pid
            # from its task plane (same arithmetic as regen below);
            # substitute the rotated-stratified vector on depth==0
            # lanes (planar.strat0_scatter_planes -- elementwise
            # u32/f32 ops only, kernel-safe; bit-identical to the XLA
            # body's remap in ops/wavefront.py).
            from .planar import strat0_scatter_planes
            pid_cur = vp_to_pid(jnp.maximum(task, 0) // tpp)
            sb0 = jnp.zeros((rows, LANES), jnp.uint32) + bk_ref[0]
            sb1 = jnp.zeros((rows, LANES), jnp.uint32) + bk_ref[1]
            svx, svy, svz = strat0_scatter_planes(
                k0, k1, pid_cur, sid, sb0, sb1, spp, unit_sample)
            m0 = dep == 0
            draws = (jnp.where(m0, svx, draws[0]),
                     jnp.where(m0, svy, draws[1]),
                     jnp.where(m0, svz, draws[2]), draws[3])
        sdx, sdy, sdz, valid, sky_r, sky_g, sky_b = kernel_shade(
            (dx, dy, dz), (nx, ny, nz), mt_ref[:], fz_ref[:], io_ref[:],
            draws, phys_refract=phys_refract, sky_bias=sky_bias)

        miss_now = active & ~hit
        scatter_now = active & hit & valid
        depth_out = scatter_now & (dep + 1 >= max_depth)
        keep = scatter_now & ~depth_out

        acr = jnp.where(miss_now, acr + ax * sky_r, acr)
        acg = jnp.where(miss_now, acg + ay * sky_g, acg)
        acb = jnp.where(miss_now, acb + az * sky_b, acb)

        ox = jnp.where(keep, px, ox)
        oy = jnp.where(keep, py, oy)
        oz = jnp.where(keep, pz, oz)
        dx = jnp.where(keep, sdx, dx)
        dy = jnp.where(keep, sdy, dy)
        dz = jnp.where(keep, sdz, dz)
        ax = jnp.where(keep, ax * alr_ref[:], ax)
        ay = jnp.where(keep, ay * alg_ref[:], ay)
        az = jnp.where(keep, az * alb_ref[:], az)
        if rr_terminate:
            # Russian-roulette termination: IN-KERNEL copy of the shared
            # contract (rng.rr_terminate_update -- keep in sync; the
            # jnp-level engines all call the helper, this kernel keeps a
            # literal copy to avoid routing stop_gradient through Mosaic)
            # -- TAG_BOUNCE + depth, counter 2; survivors boost 1/q,
            # casualties die like absorb. Bit-identity with the XLA path
            # is pinned by test_rr_termination_unbiased_and_saves_segments.
            tag = jnp.uint32(TAG_BOUNCE) + dep.astype(jnp.uint32)
            u_rr, _ = tf.draw_uniform2(k0, k1, tag, 2)
            q = jnp.clip(rr_scale * jnp.maximum(ax, jnp.maximum(ay, az)),
                         rr_qmin, 1.0)
            consider = keep & (dep + 1 >= rr_start)
            surv = consider & (u_rr < q)
            boost = jnp.where(surv, 1.0 / q, 1.0)
            ax, ay, az = ax * boost, ay * boost, az * boost
            keep = keep & (~consider | surv)
        dep = jnp.where(keep, dep + 1, dep)

        # ---- regenerate for the NEXT iteration (= wavefront.regen) ----
        idle = ~keep
        has_task = task >= 0
        pid_old = task // tpp
        run_end_old = jnp.minimum(
            (task - pid_old * tpp) * task_samples + task_samples, spp)

        # Completed tasks move (task id, rgb) into the first FREE
        # pending slot; with every slot full the lane idles until the
        # epoch flush drains them.
        task_done = idle & has_task & (sid + 1 >= run_end_old)
        remaining = task_done
        new_slots = []
        for (pt, pr, pg, pb) in slots:
            mv = remaining & (pt < 0)
            new_slots.append((jnp.where(mv, task, pt),
                              jnp.where(mv, acr, pr),
                              jnp.where(mv, acg, pg),
                              jnp.where(mv, acb, pb)))
            remaining = remaining & ~mv
        moved = task_done & ~remaining
        acr = jnp.where(moved, 0.0, acr)
        acg = jnp.where(moved, 0.0, acg)
        acb = jnp.where(moved, 0.0, acb)
        task = jnp.where(moved, -1, task)

        acquire = idle & (task < 0) & (nxt < block_end)
        task = jnp.where(acquire, nxt, task)
        nxt = jnp.where(acquire, nxt + stride, nxt)

        vp = task // tpp
        run_start = (task - vp * tpp) * task_samples
        if own_bl:
            # ops/cull.py tile_pixel inlined: tile-order virtual pixel ->
            # row-major (xp, yp); out-of-image pads trace as pixel 0 and
            # are dropped at the engine's fold.
            vp_c = jnp.maximum(vp, 0)
            t_id = vp_c // (tile * tile)
            o = vp_c - t_id * (tile * tile)
            ty = t_id // tiles_x
            txx = t_id - ty * tiles_x
            oy_t = o // tile
            ox_t = o - oy_t * tile
            yp = ty * tile + oy_t
            xp = txx * tile + ox_t
            pvalid = (xp < width) & (yp < height)
            yp = jnp.where(pvalid, yp, 0)
            xp = jnp.where(pvalid, xp, 0)
            pid = yp * width + xp
        else:
            pid = vp
        next_sample = idle & has_task & (sid + 1 < run_end_old) & ~task_done
        sid = jnp.where(acquire, run_start,
                        jnp.where(next_sample, sid + 1, sid))
        issue = acquire | next_sample

        # Camera ray for the issued (pixel, sample) -- planar.camera_rays
        # in-kernel; unissued lanes' results are fully masked off.
        zf = jnp.zeros((rows, LANES), jnp.float32)
        b0 = jnp.zeros((rows, LANES), jnp.uint32) + bk_ref[0]
        b1 = jnp.zeros((rows, LANES), jnp.uint32) + bk_ref[1]
        pk0, pk1 = tf.fold_in_words(b0, b1, pid)
        nk0, nk1 = tf.fold_in_words(pk0, pk1, sid)
        jux, juy = tf.draw_uniform2(nk0, nk1, TAG_JITTER, 0)
        if sampling == "stratified":
            # Per-PIXEL rotation from the (pid, sid=0) key.
            zk0, zk1 = tf.fold_in_words(pk0, pk1,
                                        jnp.zeros_like(sid))
            _, rot_v = tf.draw_uniform2(zk0, zk1, TAG_JITTER, 0)
            jux, juy = _rng.stratify_uv(jux, rot_v, sid, spp)
        if not own_bl:
            yp = pid // width
            xp = pid - yp * width
        # planar.camera_rays divides by width/height; multiplying by an
        # f32 reciprocal is not bit-identical, so divide here too.
        u = (xp.astype(jnp.float32) + jux) / jnp.float32(width)
        v = (yp.astype(jnp.float32) + juy) / jnp.float32(height)
        og0, og1, og2 = cam_ref[0], cam_ref[1], cam_ref[2]
        fx = cam_ref[3] + cam_ref[6] * u + cam_ref[9] * (1.0 - v)
        fy = cam_ref[4] + cam_ref[7] * u + cam_ref[10] * (1.0 - v)
        fz_ = cam_ref[5] + cam_ref[8] * u + cam_ref[11] * (1.0 - v)
        lens_r = cam_ref[18]
        if camera_mode == "cuda":
            nox, noy, noz = zf + og0, zf + og1, zf + og2
            ndx, ndy, ndz = fx, fy, fz_  # quirk Q11: no -origin
        elif camera_mode == "pinhole":
            nox, noy, noz = zf + og0, zf + og1, zf + og2
            ndx, ndy, ndz = fx - og0, fy - og1, fz_ - og2
        elif camera_mode == "cpu":
            # camera.hxx:51-56 (quirks Q2 + Q11): unit-SPHERE lens
            # sample, world-axis offset scaled by screen (u, v).
            lu0, lu1 = tf.draw_uniform2(nk0, nk1, TAG_LENS, 0)
            lu2, _u = tf.draw_uniform2(nk0, nk1, TAG_LENS, 1)
            zu = 2.0 * lu0 - 1.0
            rho = jnp.sqrt(jnp.maximum(1.0 - zu * zu, 0.0))
            phi = jnp.float32(TWO_PI) * lu1
            sx = rho * jnp.cos(phi)
            sy = rho * jnp.sin(phi)
            sr = lu2 ** (1.0 / 3.0)
            rdx, rdy = sx * sr, sy * sr
            offx = u * rdx * lens_r
            offy = v * rdy * lens_r
            nox, noy, noz = og0 + offx, og1 + offy, zf + og2
            ndx, ndy, ndz = fx - offx, fy - offy, fz_
        elif camera_mode == "thinlens":
            lu0, lu1 = tf.draw_uniform2(nk0, nk1, TAG_LENS, 0)
            if sampling == "stratified":
                # Per-PIXEL lens rotations: the unconsumed (pid, sid=0)
                # (TAG_LENS, j=2) counter -- rng.stratify_lens_uv.
                lr_u, lr_v = tf.draw_uniform2(zk0, zk1, TAG_LENS, 2)
                lu0, lu1 = _rng.stratify_lens_uv(lu0, lr_u, lr_v, sid,
                                                 spp)
            theta = jnp.float32(TWO_PI) * lu0
            rd = jnp.sqrt(lu1)
            r0 = jnp.cos(theta) * rd * lens_r
            r1 = jnp.sin(theta) * rd * lens_r
            offx = cam_ref[12] * r0 + cam_ref[15] * r1
            offy = cam_ref[13] * r0 + cam_ref[16] * r1
            offz = cam_ref[14] * r0 + cam_ref[17] * r1
            nox, noy, noz = og0 + offx, og1 + offy, og2 + offz
            ndx = fx - og0 - offx
            ndy = fy - og1 - offy
            ndz = fz_ - og2 - offz
        else:
            raise ValueError(f"unknown camera mode: {camera_mode!r}")

        one = jnp.float32(1.0)
        outs[0][:] = nxt
        outs[1][:] = task
        outs[2][:] = sid
        outs[ACT][:] = (keep | issue).astype(jnp.int32)
        outs[4][:] = jnp.where(issue, nox, ox)
        outs[5][:] = jnp.where(issue, noy, oy)
        outs[6][:] = jnp.where(issue, noz, oz)
        outs[7][:] = jnp.where(issue, ndx, dx)
        outs[8][:] = jnp.where(issue, ndy, dy)
        outs[9][:] = jnp.where(issue, ndz, dz)
        outs[10][:] = jnp.where(issue, one, ax)
        outs[11][:] = jnp.where(issue, one, ay)
        outs[12][:] = jnp.where(issue, one, az)
        outs[13][:] = jnp.where(issue, 0, dep)
        outs[14][:] = acr
        outs[15][:] = acg
        outs[16][:] = acb
        outs[17][:] = jnp.where(issue, nk0, k0)
        outs[18][:] = jnp.where(issue, nk1, k1)
        for j, (pt, pr, pg, pb) in enumerate(new_slots):
            outs[N_BASE + 4 * j][:] = pt
            outs[N_BASE + 4 * j + 1][:] = pr
            outs[N_BASE + 4 * j + 2][:] = pg
            outs[N_BASE + 4 * j + 3][:] = pb


def shade_regen(lane_state, seg, params, camvec, base_words, *,
                rows: int, max_depth: int, unit_sample: bool,
                phys_refract: bool, sky_bias: float, width: int,
                height: int, spp: int, task_samples: int, tpp: int,
                n_tasks: int, n_slots: int, stride: int,
                camera_mode: str, rr_terminate: bool = False,
                rr_start: int = 3, rr_qmin: float = 0.05,
                rr_scale: float = 1.0,
                interpret: bool | None = None, own_bl: int = 0,
                t_b: int = 0, tiles_x: int = 0, worker_base=None,
                sampling: str = "iid"):
    """One fused shade+state-update+regen step on the lane state.

    lane_state: ops/wavefront.py's (19 + 4*n_slots)-plane tuple
      (nxt, task, sid, active, ox, oy, oz, dx, dy, dz, ax, ay, az,
       depth, accr, accg, accb, k0, k1, *slot planes) where slot j is
      (pt, pr, pg, pb) with pt the finished task id (-1 = free).
    seg: (hit_i, t) from pallas_segment.segment_closest_hit.
    params: the 10 resolved per-ray param planes
      (pallas_segment.resolve_params).
    camvec: pack_camera(cam); base_words: (2,) u32 base-key words.
    own_bl/t_b/tiles_x/worker_base: TILE ownership statics + the
      worker's task-base scalar (ops/wavefront.py; own_bl=0 = strided).
    Returns the next lane state (same layout).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_state = N_BASE + 4 * n_slots
    assert len(lane_state) == n_state, (len(lane_state), n_state)
    ox = lane_state[4]
    r_total = ox.shape[0]
    assert r_total % rows == 0, (r_total, rows)
    grid = r_total // rows

    bs = pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)
    i32, f32, u32 = jnp.int32, jnp.float32, jnp.uint32
    # nxt task sid act | ox oy oz dx dy dz ax ay az | dep | acc3
    # | k0 k1 | per-slot (pt, rgb)
    out_dtypes = ([i32, i32, i32, i32] + [f32] * 9 + [i32]
                  + [f32] * 3 + [u32, u32]
                  + [i32, f32, f32, f32] * n_slots)
    shapes = [jax.ShapeDtypeStruct((r_total, LANES), dt)
              for dt in out_dtypes]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(grid,),
        in_specs=[bs] * (12 + n_state), out_specs=[bs] * n_state)
    state_in = (lane_state[:3] + (lane_state[ACT].astype(i32),)
                + lane_state[4:17]
                + (lane_state[17].astype(u32), lane_state[18].astype(u32))
                + lane_state[N_BASE:])
    if worker_base is None:
        wb = jnp.zeros((1,), i32)
    else:
        wb = jnp.reshape(worker_base, (1,)).astype(i32)
    hit_i, seg_t = seg
    out = pl.pallas_call(
        functools.partial(
            _kernel_shade_regen, rows=rows, max_depth=max_depth,
            unit_sample=unit_sample, phys_refract=phys_refract,
            sky_bias=sky_bias, width=width, height=height, spp=spp,
            task_samples=task_samples, tpp=tpp, n_tasks=n_tasks,
            n_slots=n_slots, stride=stride, camera_mode=camera_mode,
            rr_terminate=rr_terminate, rr_start=rr_start,
            rr_qmin=rr_qmin, rr_scale=rr_scale, own_bl=own_bl, t_b=t_b,
            tiles_x=tiles_x, sampling=sampling),
        grid_spec=grid_spec, out_shape=shapes, interpret=interpret,
    )(camvec, base_words, wb, hit_i, seg_t, *params, *state_in)
    return (tuple(out[:3]) + (out[ACT] > 0,) + tuple(out[4:n_state]))
