"""Whole-bounce Pallas megakernel: intersect + resolve + RNG + shade.

ops/pallas_segment.py fused the closest-hit; the rest of a wavefront
bounce still ran as XLA fusions around it, each paying an HBM round
trip and (profiled on the v5e headline frame) ~27% of the frame:
one-hot param resolve ~7.6%, threefry draws ~7%, shade/state selects
~12%. This kernel absorbs the whole bounce:

  1. Closest-hit min loop -- byte-for-byte the candidate math of
     pallas_segment._kernel (q-space compare, NaN-tolerant sqrt, rr
     prefetch, UNROLL tournament).
  2. Winner-param resolve IN VMEM: a TRANSPOSED one-hot contraction
     per sublane row -- ohT[s, lane] = (s_b[row, lane] == s) built with
     a broadcasted iota (no lanes->sublanes relayout, the limit that
     blocked the straight orientation), then (16, S) @ (S, 128) on the
     MXU. The one-hot never touches HBM (the XLA-side version
     materialized ~31 MB/iteration).
  3. Per-bounce randomness IN KERNEL: ops/threefry.py's raw counter
     contract is plain uint32 add/xor/rotate, so the draws lower on the
     VPU and stay bit-identical to every other engine and the oracle.
  4. The shared shade math (ops/planar.bounce_planar: lambert, metal
     with absorb, dielectric Schlick/TIR, unclamped sky mix) and the
     engine's state update (sky deposit into task accumulators,
     keep-masked origin/direction/attenuation/depth advance).

Reference semantics per material: lambert cuda_impl.cu:204-213, metal
:216-229, dielectric :232-262, sky main.cxx:47-50 / cuda_impl.cu:123-126.

In/out is exactly the engine's lane state (16 planes in, 14 out), so
per-iteration HBM traffic drops below the old kernel+fusions path while
the XLA side of the inner loop shrinks to lane regeneration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import threefry as tf

LANES = 128
_BIG = 1e30
UNROLL = 8
TABLE_ROWS = 16  # 10 used + pad to an MXU-friendly sublane count

SKY_WHITE = (1.0, 1.0, 1.0)
SKY_BLUE = (0.5, 0.7, 1.0)  # main.cxx:49; cuda_impl.cu:125
TAG_BOUNCE = 2  # ops/rng.py

METAL = 1
DIELECTRIC = 2
FLT_MIN = 1.1754943508222875e-38


def _normalize3(x, y, z):
    """Planar math3.normalize (FLT_MIN guard, math.hxx:226-233)."""
    l = jnp.sqrt(x * x + y * y + z * z)
    good = l > FLT_MIN
    inv = 1.0 / jnp.where(good, l, 1.0)
    return (jnp.where(good, x * inv, x), jnp.where(good, y * inv, y),
            jnp.where(good, z * inv, z))


def kernel_bounce_draws(k0, k1, depth, *, unit_sample: bool):
    """In-kernel ops/rng.py contract v3 draws (== planar.bounce_draws).

    Two raw-counter threefry blocks under the ray key at tag
    TAG_BOUNCE + depth -> (scatter vector planes, reflect-uniform plane).
    """
    tag = jnp.uint32(TAG_BOUNCE) + depth.astype(jnp.uint32)
    u0, u1 = tf.draw_uniform2(k0, k1, tag, 0)
    u2, u3 = tf.draw_uniform2(k0, k1, tag, 1)
    z = 2.0 * u0 - 1.0
    rho = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = jnp.float32(6.283185307179586) * u1
    rvx = rho * jnp.cos(phi)
    rvy = rho * jnp.sin(phi)
    rvz = z
    if not unit_sample:
        r3 = u2 ** (1.0 / 3.0)
        rvx, rvy, rvz = rvx * r3, rvy * r3, rvz * r3
    return rvx, rvy, rvz, u3


def kernel_shade(dirs, normals, mt, fz, io, draws, *, phys_refract: bool,
                 sky_bias: float):
    """In-kernel material scatter + sky (== planar.bounce_planar math).

    dirs/normals: (dx,dy,dz)/(nx,ny,nz) planes; draws: the
    kernel_bounce_draws tuple. Returns (sdx, sdy, sdz, valid, sky_r,
    sky_g, sky_b). Reference semantics: lambert cuda_impl.cu:204-213,
    metal :216-229, dielectric :232-262, sky main.cxx:47-50.
    """
    dx, dy, dz = dirs
    nx, ny, nz = normals
    rvx, rvy, rvz, ru = draws
    ux, uy, uz = _normalize3(dx, dy, dz)
    ldx, ldy, ldz = nx + rvx, ny + rvy, nz + rvz
    du = ux * nx + uy * ny + uz * nz
    rfx = ux - 2.0 * du * nx
    rfy = uy - 2.0 * du * ny
    rfz = uz - 2.0 * du * nz
    mdx, mdy, mdz = rfx + rvx * fz, rfy + rvy * fz, rfz + rvz * fz
    metal_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0
    cos = du
    entering = cos <= 0.0
    sgn = jnp.where(entering, 1.0, -1.0)
    owx, owy, owz = nx * sgn, ny * sgn, nz * sgn
    ri = jnp.where(entering, 1.0 / io, io)
    cosab = jnp.abs(cos)
    cos_i = owx * ux + owy * uy + owz * uz
    kk = 1.0 - ri * ri * (1.0 - cos_i * cos_i)
    tir = kk < 0.0
    sq = jnp.sqrt(jnp.maximum(kk, 0.0))
    if phys_refract:
        tx = ri * ux - (ri * cos_i + sq) * owx
        ty = ri * uy - (ri * cos_i + sq) * owy
        tz = ri * uz - (ri * cos_i + sq) * owz
    else:
        tx = ux * ri - (owx * sq + cos_i * ri)
        ty = uy * ri - (owy * sq + cos_i * ri)
        tz = uz * ri - (owz * sq + cos_i * ri)
    tx = jnp.where(tir, 0.0, tx)
    ty = jnp.where(tir, 0.0, ty)
    tz = jnp.where(tir, 0.0, tz)
    r0 = ((1.0 - ri) / (1.0 + ri)) ** 2
    schlick = r0 + (1.0 - r0) * (1.0 - cosab) ** 5
    prob = jnp.where(tir, 1.0, schlick)
    refl = ru < prob
    gdx = jnp.where(refl, rfx, tx)
    gdy = jnp.where(refl, rfy, ty)
    gdz = jnp.where(refl, rfz, tz)

    is_metal = mt == METAL
    is_diel = mt == DIELECTRIC
    sdx = jnp.where(is_diel, gdx, jnp.where(is_metal, mdx, ldx))
    sdy = jnp.where(is_diel, gdy, jnp.where(is_metal, mdy, ldy))
    sdz = jnp.where(is_diel, gdz, jnp.where(is_metal, mdz, ldz))
    # NOT where(is_metal, metal_ok, True): a vector bool LITERAL hits
    # Mosaic's unsupported i8->i1 truncation; pure predicate algebra
    # stays in i1.
    valid = metal_ok | ~is_metal

    tsky = 0.5 * uy + sky_bias
    sky_r = SKY_WHITE[0] * (1.0 - tsky) + SKY_BLUE[0] * tsky
    sky_g = SKY_WHITE[1] * (1.0 - tsky) + SKY_BLUE[1] * tsky
    sky_b = SKY_WHITE[2] * (1.0 - tsky) + SKY_BLUE[2] * tsky
    return sdx, sdy, sdz, valid, sky_r, sky_g, sky_b


def _kernel_mega(cx_ref, cy_ref, cz_ref, rr_ref,  # SMEM (S_pad,)
                 tab_ref,  # VMEM (TABLE_ROWS, S_tab) transposed table
                 act_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 ax_ref, ay_ref, az_ref, ar_ref, ag_ref, ab_ref,
                 dep_ref, k0_ref, k1_ref,
                 # outputs
                 nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
                 nax_ref, nay_ref, naz_ref, nar_ref, nag_ref, nab_ref,
                 keep_ref, ndep_ref,
                 # scratch
                 sb_ref, par_ref,
                 *, rows: int, n_spheres: int, s_tab: int, t_min: float,
                 max_depth: int, unit_sample: bool, phys_refract: bool,
                 sky_bias: float):
    any_active = jnp.any(act_ref[:] > 0)

    @pl.when(jnp.logical_not(any_active))
    def _():
        # Drained block: state passes through untouched (VMEM copies).
        nox_ref[:] = ox_ref[:]
        noy_ref[:] = oy_ref[:]
        noz_ref[:] = oz_ref[:]
        ndx_ref[:] = dx_ref[:]
        ndy_ref[:] = dy_ref[:]
        ndz_ref[:] = dz_ref[:]
        nax_ref[:] = ax_ref[:]
        nay_ref[:] = ay_ref[:]
        naz_ref[:] = az_ref[:]
        nar_ref[:] = ar_ref[:]
        nag_ref[:] = ag_ref[:]
        nab_ref[:] = ab_ref[:]
        keep_ref[:] = jnp.zeros((rows, LANES), jnp.int32)
        ndep_ref[:] = dep_ref[:]

    @pl.when(any_active)
    def _():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        q_min = t_min * a

        # ---- 1. closest-hit min loop (pallas_segment._kernel math) ----
        def cand(s):
            cx, cy, cz, rr = cx_ref[s], cy_ref[s], cz_ref[s], rr_ref[s]
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - rr
            sq = jnp.sqrt(b * b - a * c)  # NaN when disc < 0: miss
            nb = -b
            q0 = nb - sq
            q1 = nb + sq
            return jnp.where(q0 > q_min, q0,
                             jnp.where(q1 > q_min, q1, _BIG))

        def body(i, carry):
            q_b, s_b = carry
            s = i * UNROLL
            qs = [cand(s + k) for k in range(UNROLL)]
            qp, ip = qs[0], s
            for k in range(1, UNROLL):
                wk = qs[k] < qp
                qp = jnp.where(wk, qs[k], qp)
                ip = jnp.where(wk, s + k, ip)
            w = qp < q_b
            return jnp.where(w, qp, q_b), jnp.where(w, ip, s_b)

        q_b = jnp.full((rows, LANES), _BIG, jnp.float32)
        s_b = jnp.zeros((rows, LANES), jnp.int32)
        q_b, s_b = jax.lax.fori_loop(0, n_spheres // UNROLL, body,
                                     (q_b, s_b))
        hit = q_b < _BIG
        t_safe = jnp.where(hit, q_b * inv_a, 1.0)

        # ---- 2. winner params: transposed one-hot matmul per row ------
        sb_ref[:] = s_b

        def rbody(r, _):
            s_row = sb_ref[pl.ds(r, 1), :]  # (1, 128)
            ohT = (jax.lax.broadcasted_iota(jnp.int32, (s_tab, LANES), 0)
                   == s_row).astype(jnp.float32)
            p16 = jnp.dot(tab_ref[:], ohT,
                          preferred_element_type=jnp.float32)  # (16, 128)
            for j in range(10):
                par_ref[j, pl.ds(r, 1), :] = p16[j:j + 1, :]
            return 0

        jax.lax.fori_loop(0, rows, rbody, 0)
        chx, chy, chz = par_ref[0], par_ref[1], par_ref[2]
        rh = par_ref[3]
        mt = par_ref[4].astype(jnp.int32)
        alr, alg, alb_ = par_ref[5], par_ref[6], par_ref[7]
        fz, io = par_ref[8], par_ref[9]

        px = ox + t_safe * dx
        py = oy + t_safe * dy
        pz = oz + t_safe * dz
        inv_r = 1.0 / jnp.where(rh != 0.0, rh, 1.0)
        nx = (px - chx) * inv_r
        ny = (py - chy) * inv_r
        nz = (pz - chz) * inv_r

        # ---- 3+4. per-bounce draws + shade (shared in-kernel helpers) -
        draws = kernel_bounce_draws(k0_ref[:], k1_ref[:], dep_ref[:],
                                    unit_sample=unit_sample)
        sdx, sdy, sdz, valid, sky_r, sky_g, sky_b = kernel_shade(
            (dx, dy, dz), (nx, ny, nz), mt, fz, io, draws,
            phys_refract=phys_refract, sky_bias=sky_bias)

        # ---- 5. state update (ops/wavefront.segment, verbatim) --------
        active = act_ref[:] > 0
        depth = dep_ref[:]
        miss_now = active & ~hit
        scatter_now = active & hit & valid
        depth_out = scatter_now & (depth + 1 >= max_depth)
        keep = scatter_now & ~depth_out

        ax, ay, az = ax_ref[:], ay_ref[:], az_ref[:]
        nar_ref[:] = jnp.where(miss_now, ar_ref[:] + ax * sky_r, ar_ref[:])
        nag_ref[:] = jnp.where(miss_now, ag_ref[:] + ay * sky_g, ag_ref[:])
        nab_ref[:] = jnp.where(miss_now, ab_ref[:] + az * sky_b, ab_ref[:])

        nox_ref[:] = jnp.where(keep, px, ox)
        noy_ref[:] = jnp.where(keep, py, oy)
        noz_ref[:] = jnp.where(keep, pz, oz)
        ndx_ref[:] = jnp.where(keep, sdx, dx)
        ndy_ref[:] = jnp.where(keep, sdy, dy)
        ndz_ref[:] = jnp.where(keep, sdz, dz)
        nax_ref[:] = jnp.where(keep, ax * alr, ax)
        nay_ref[:] = jnp.where(keep, ay * alg, ay)
        naz_ref[:] = jnp.where(keep, az * alb_, az)
        keep_ref[:] = keep.astype(jnp.int32)
        ndep_ref[:] = jnp.where(keep, depth + 1, depth)


def _tableT(sphere_params, s_tab: int):
    """(TABLE_ROWS, s_tab) transposed per-sphere param table
    [cx cy cz r mt ar ag ab fz io]; pad spheres/rows are zero (they can
    never win the min loop, and hit=0 lanes mask everything)."""
    s = sphere_params[0].shape[0]
    tab = jnp.zeros((TABLE_ROWS, s_tab), jnp.float32)
    for j, v in enumerate(sphere_params[:4]):
        tab = tab.at[j, :s].set(v)
    tab = tab.at[4, :s].set(sphere_params[4].astype(jnp.float32))
    for j in range(5, 10):
        tab = tab.at[j, :s].set(sphere_params[j])
    return tab


@functools.partial(
    jax.jit, static_argnames=("t_min", "rows", "max_depth", "unit_sample",
                              "phys_refract", "sky_bias", "interpret"))
def mega_bounce(state_planes, sphere_params, *, t_min: float, rows: int,
                max_depth: int, unit_sample: bool, phys_refract: bool,
                sky_bias: float, interpret: bool | None = None):
    """One full wavefront bounce on planar lane state, fused in Pallas.

    state_planes: (active, ox, oy, oz, dx, dy, dz, ax, ay, az,
                   accr, accg, accb, depth, k0, k1) -- (R, 128) planes
      (active bool/i32, depth i32, k0/k1 uint32, rest f32).
    sphere_params: the 10-tuple from pallas_segment.sphere_params_from_scene.
    Returns (ox, oy, oz, dx, dy, dz, ax, ay, az, accr, accg, accb,
             keep (bool), depth) -- the post-bounce lane state.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    (active, ox, oy, oz, dx, dy, dz, ax, ay, az, accr, accg, accb,
     depth, k0, k1) = state_planes
    r_total = ox.shape[0]
    assert r_total % rows == 0, (r_total, rows)
    grid = r_total // rows
    s = sphere_params[0].shape[0]

    # Min-loop sphere tables padded to the UNROLL multiple; pads carry
    # rr = -1 (disc < 0 robustly -- see pallas_segment.segment_closest_hit).
    cx, cy, cz, r = sphere_params[:4]
    rr = r * r
    pad = -s % UNROLL
    if pad:
        zf = jnp.zeros((pad,), cx.dtype)
        cx = jnp.concatenate([cx, zf])
        cy = jnp.concatenate([cy, zf])
        cz = jnp.concatenate([cz, zf])
        rr = jnp.concatenate([rr, zf - 1.0])
    s_tab = -(-s // LANES) * LANES  # resolve table lane padding
    tab = _tableT(sphere_params, s_tab)

    act = active.astype(jnp.int32)
    bs = pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)
    tab_bs = pl.BlockSpec((TABLE_ROWS, s_tab), lambda i, *_: (0, 0),
                          memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_dtypes = [f32] * 12 + [jnp.int32, jnp.int32]
    shapes = [jax.ShapeDtypeStruct((r_total, LANES), dt)
              for dt in out_dtypes]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(grid,),
        in_specs=[tab_bs] + [bs] * 16, out_specs=[bs] * 14,
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.int32),        # sb
            pltpu.VMEM((10, rows, LANES), jnp.float32),  # params
        ])
    out = pl.pallas_call(
        functools.partial(
            _kernel_mega, rows=rows, n_spheres=s + pad, s_tab=s_tab,
            t_min=float(t_min), max_depth=max_depth,
            unit_sample=unit_sample, phys_refract=phys_refract,
            sky_bias=sky_bias),
        grid_spec=grid_spec, out_shape=shapes, interpret=interpret,
    )(cx, cy, cz, rr, tab, act, ox, oy, oz, dx, dy, dz,
      ax, ay, az, accr, accg, accb, depth.astype(jnp.int32),
      k0.astype(jnp.uint32), k1.astype(jnp.uint32))
    (nox, noy, noz, ndx, ndy, ndz, nax, nay, naz, nar, nag, nab,
     keep_i, ndep) = out
    return (nox, noy, noz, ndx, ndy, ndz, nax, nay, naz, nar, nag, nab,
            keep_i > 0, ndep)
