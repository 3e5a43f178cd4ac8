"""Pallas TPU megakernel: one trace segment = intersect + surface + material.

Motivation (measured on v5e): XLA's per-ray gathers cost ~80ns each
(scene.material_index[idx], albedo[mi], centers[idx]... ~40ms per bounce at
512k rays -- the dominant cost of the naive wavefront loop), while a fused
VMEM kernel does the whole 512k x 489 closest-hit in ~1ms. So the kernel
never produces an index to gather from: it carries the *best sphere's*
geometry and material parameters through the running min as in-register
selects, and emits ready-to-use planes:

  inputs  (per ray, planar (ROWS,128) f32): ox oy oz dx dy dz
  prefetch (per sphere, SMEM): cx cy cz r  mtype  alb_r alb_g alb_b fuzz ior
          (material params pre-gathered per *sphere* on the host once per
           scene -- an (S,)-sized gather, not a per-ray one)
  outputs (per ray, planar): hit t px py pz nx ny nz mt ar ag ab fz io

Candidate/selection semantics identical to ops/intersect.py: near root
preferred, far root fallback, (t_min, inf) window, strict '<' running min
keeping the earliest sphere; normal = (p-c)/r so negative radii flip
inward (hollow glass, SURVEY Q10; raytracer.hxx:71).

Interpret mode on non-TPU backends keeps this the single code path for
tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_BIG = 1e30


def _kernel(cx_ref, cy_ref, cz_ref, r_ref, mt_ref, ar_ref, ag_ref, ab_ref,
            fz_ref, io_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            hit_ref, t_ref, px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref,
            mt_out, ar_out, ag_out, ab_out, fz_out, io_out,
            *, rows: int, n_spheres: int, t_min: float):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a

    def body(s, carry):
        t_b, cx_b, cy_b, cz_b, r_b, mt_b, ar_b, ag_b, ab_b, fz_b, io_b = carry
        cx, cy, cz, r = cx_ref[s], cy_ref[s], cz_ref[s], r_ref[s]
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - a * c
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        t0 = (-b - sq) * inv_a
        t1 = (-b + sq) * inv_a
        v0 = pos & (t0 > t_min)
        v1 = pos & (t1 > t_min)
        tc = jnp.where(v0, t0, jnp.where(v1, t1, _BIG))
        w = tc < t_b
        return (jnp.where(w, tc, t_b),
                jnp.where(w, cx, cx_b), jnp.where(w, cy, cy_b),
                jnp.where(w, cz, cz_b), jnp.where(w, r, r_b),
                jnp.where(w, mt_ref[s], mt_b),
                jnp.where(w, ar_ref[s], ar_b), jnp.where(w, ag_ref[s], ag_b),
                jnp.where(w, ab_ref[s], ab_b),
                jnp.where(w, fz_ref[s], fz_b), jnp.where(w, io_ref[s], io_b))

    shape = (rows, LANES)
    init = (jnp.full(shape, _BIG, jnp.float32),
            jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32), jnp.ones(shape, jnp.float32),
            jnp.zeros(shape, jnp.int32),
            jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32), jnp.ones(shape, jnp.float32))
    (t_b, cx_b, cy_b, cz_b, r_b, mt_b, ar_b, ag_b, ab_b, fz_b,
     io_b) = jax.lax.fori_loop(0, n_spheres, body, init)

    hit = t_b < _BIG
    t_safe = jnp.where(hit, t_b, 1.0)
    px = ox + t_safe * dx
    py = oy + t_safe * dy
    pz = oz + t_safe * dz
    inv_r = 1.0 / r_b  # r_b init 1.0; no-hit lanes stay safe
    hit_ref[:] = hit.astype(jnp.int32)
    t_ref[:] = t_b
    px_ref[:] = px
    py_ref[:] = py
    pz_ref[:] = pz
    nx_ref[:] = (px - cx_b) * inv_r
    ny_ref[:] = (py - cy_b) * inv_r
    nz_ref[:] = (pz - cz_b) * inv_r
    mt_out[:] = mt_b
    ar_out[:] = ar_b
    ag_out[:] = ag_b
    ab_out[:] = ab_b
    fz_out[:] = fz_b
    io_out[:] = io_b


@functools.partial(
    jax.jit, static_argnames=("t_min", "rows", "interpret"))
def trace_segment(rays, sphere_params, t_min, rows: int = 128,
                  interpret: bool | None = None):
    """One fused trace segment over planar ray state.

    Args:
      rays: tuple of 6 planar (R, 128) f32 arrays (ox oy oz dx dy dz); R
        must be a multiple of ``rows``.
      sphere_params: tuple of 10 per-sphere (S,) arrays
        (cx cy cz r mtype ar ag ab fuzz ior); mtype is i32, rest f32.
      t_min: static epsilon.
      rows: sublane rows per grid program (rays/program = rows*128).

    Returns dict of planar (R, 128) outputs:
      hit (i32 0/1), t, px py pz, nx ny nz, mt (i32), ar ag ab, fz, io.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r_total = rays[0].shape[0]
    assert r_total % rows == 0, (r_total, rows)
    s = sphere_params[0].shape[0]
    grid = r_total // rows

    bs = pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10, grid=(grid,),
        in_specs=[bs] * 6, out_specs=[bs] * 14)
    f32 = jnp.float32
    shapes = [jax.ShapeDtypeStruct((r_total, LANES), dt) for dt in
              (jnp.int32, f32, f32, f32, f32, f32, f32, f32, jnp.int32,
               f32, f32, f32, f32, f32)]
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, n_spheres=s,
                          t_min=float(t_min)),
        grid_spec=grid_spec, out_shape=shapes, interpret=interpret,
    )(*sphere_params, *rays)
    names = ("hit", "t", "px", "py", "pz", "nx", "ny", "nz", "mt", "ar",
             "ag", "ab", "fz", "io")
    return dict(zip(names, out))


def sphere_params_from_scene(scene):
    """Pre-gather per-sphere material params: 10 (S,) arrays.

    The only gather is (S,)-sized (materials indexed by
    scene.material_index), done once per trace -- never per ray.
    """
    mi = scene.material_index
    alb = scene.albedo[mi]
    return (scene.centers[:, 0], scene.centers[:, 1], scene.centers[:, 2],
            scene.radii, scene.mtype[mi].astype(jnp.int32),
            alb[:, 0], alb[:, 1], alb[:, 2],
            scene.fuzz[mi], scene.ior[mi])
