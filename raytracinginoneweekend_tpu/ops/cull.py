"""Conservative per-block candidate culling for coherent ray blocks.

The dual-pool wavefront (ops/wavefront_dual.py) keeps PRIMARY camera rays
in their own pool whose kernel blocks hold tile-contiguous pixels, so each
block's rays fit a narrow bounding cone. This module computes, per kernel
block and entirely on-device (vectorized jnp, a few hundred ops per
block x sphere -- negligible next to the intersect kernel):

  1. block cone stats -- apex sphere (o0, ro) around the origins, axis u =
     mean unit direction, cos of the max deviation half-angle;
  2. a conservative might-WIN sphere mask: the sphere (expanded by ro +
     margin) must touch the solid cone, and must not be provably occluded
     -- a sphere whose nearest possible hit lies beyond the farthest
     possible near-hit of a sphere the WHOLE cone surely hits can never
     win the closest-hit running min (winning is material-independent:
     cuda_impl.cu:172-192's closest_so_far logic picks the nearest hit
     before any scatter decision);
  3. per-block candidate index lists + counts for the list-driven Pallas
     kernel (ops/pallas_segment.segment_closest_hit_list).

Measured on the huge scene (1200x800 thinlens, 32-pixel tile swizzle,
8192-lane blocks): mean 3.1 candidates of 489, max 16, zero true winners
culled over 100+ sampled blocks (tools kept in tests/test_cull.py).

All bounds are conservative with explicit f32 margins:
  * cone containment: every ray origin is within ro of o0 and every unit
    direction within angle alpha of u, so any hittable sphere center lies
    within r + ro of the solid cone from o0;
  * occluder sure-hit: a ray's lateral offset from the axis at axial
    distance a1 is at most ro + a1*tan(alpha); if that stays under the
    occluder radius (with margin) every ray pierces it;
  * distance ordering happens in world units; t_min windows are converted
    with the block's max |d|.
Blocks whose cone is wide (cos alpha < 0.5) or empty fall back to
keep-everything; correctness never depends on coherence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pallas_segment import UNROLL_LIST

LANES = 128
_MARGIN = 3e-2       # absolute world-space slack over f32 bound errors
_MIN_COSA = 0.5      # below this (half-angle > 60deg) keep everything


def block_cone_stats(active, rays, rows: int):
    """Masked per-kernel-block cone statistics.

    active: (R, 128) bool; rays: 6 planar (R, 128) f32 planes.
    Returns dict of (B,) arrays (B = R/rows): o0x/y/z, ro, ux/y/z, cosa,
    n (active count), oy_hi, wy_hi, dn_hi.
    """
    ox, oy, oz, dx, dy, dz = rays
    r_total = ox.shape[0]
    b = r_total // rows

    def blk(v):
        return v.reshape(b, rows * LANES)

    m = blk(active)
    n = m.sum(axis=1)
    safe_n = jnp.maximum(n, 1)

    def mean(v):
        return jnp.where(m, blk(v), 0.0).sum(axis=1) / safe_n

    def amax(v, fill):
        return jnp.where(m, blk(v), fill).max(axis=1)

    o0x, o0y, o0z = mean(ox), mean(oy), mean(oz)
    bx, by, bz = blk(ox), blk(oy), blk(oz)
    d2 = ((bx - o0x[:, None]) ** 2 + (by - o0y[:, None]) ** 2
          + (bz - o0z[:, None]) ** 2)
    ro = jnp.sqrt(jnp.where(m, d2, 0.0).max(axis=1))

    ddx, ddy, ddz = blk(dx), blk(dy), blk(dz)
    dn = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
    dn_safe = jnp.where(dn > 0, dn, 1.0)
    wx, wy, wz = ddx / dn_safe, ddy / dn_safe, ddz / dn_safe
    umx = jnp.where(m, wx, 0.0).sum(axis=1) / safe_n
    umy = jnp.where(m, wy, 0.0).sum(axis=1) / safe_n
    umz = jnp.where(m, wz, 0.0).sum(axis=1) / safe_n
    ul = jnp.sqrt(umx * umx + umy * umy + umz * umz)
    degenerate = ul < 1e-6
    ul_safe = jnp.where(degenerate, 1.0, ul)
    ux, uy, uz = umx / ul_safe, umy / ul_safe, umz / ul_safe
    cosa = jnp.where(m, wx * ux[:, None] + wy * uy[:, None]
                     + wz * uz[:, None], 1.0).min(axis=1)
    cosa = jnp.clip(jnp.where(degenerate | (n == 0), -1.0, cosa),
                    -1.0, 1.0)
    return {
        "o0x": o0x, "o0y": o0y, "o0z": o0z, "ro": ro,
        "ux": ux, "uy": uy, "uz": uz, "cosa": cosa, "n": n,
        "oy_hi": amax(oy, -jnp.inf), "wy_hi": jnp.where(
            m, wy, -jnp.inf).max(axis=1),
        "dn_hi": amax(dn, 0.0),
    }


def candidate_lists(stats, cx, cy, cz, radii, t_min: float):
    """(B,) cone stats + (S,) sphere geometry -> (counts, lists).

    counts: (B,) i32, rounded up to UNROLL_LIST (0 for empty blocks).
    lists: (B, L) i32 ascending candidate ids; pads point at id S (the
    caller-appended rr = -1 pad sphere). L = ceil(S/UNROLL_LIST)*UNROLL.
    """
    s = cx.shape[0]
    rabs = jnp.abs(radii)[None, :]
    vx = cx[None, :] - stats["o0x"][:, None]
    vy = cy[None, :] - stats["o0y"][:, None]
    vz = cz[None, :] - stats["o0z"][:, None]
    ux, uy, uz = (stats[k][:, None] for k in ("ux", "uy", "uz"))
    ro = stats["ro"][:, None]
    cosa = stats["cosa"][:, None]
    sina = jnp.sqrt(jnp.clip(1.0 - cosa * cosa, 0.0, 1.0))

    a1 = vx * ux + vy * uy + vz * uz
    vv = vx * vx + vy * vy + vz * vz
    perp = jnp.sqrt(jnp.maximum(vv - a1 * a1, 0.0))
    r_eff = rabs + ro + _MARGIN
    e = cosa * perp - sina * a1
    keep = (e <= r_eff) & (a1 >= -r_eff)

    # --- occlusion ---------------------------------------------------
    narrow = stats["cosa"] > _MIN_COSA
    tana = sina / jnp.where(cosa > _MIN_COSA, cosa, 1.0)
    m_hi = perp + ro + jnp.maximum(a1, 0.0) * tana
    vlen = jnp.sqrt(vv)
    near = vlen - rabs - ro              # earliest possible hit distance
    t_min_w = t_min * stats["dn_hi"][:, None]
    sure = (narrow[:, None] & (a1 > 0.0) & (m_hi + _MARGIN <= rabs)
            & (near > t_min_w + _MARGIN))
    s_occ_s = vlen + ro - jnp.sqrt(jnp.maximum(rabs * rabs - m_hi * m_hi,
                                               0.0))
    s_occ = jnp.where(sure, s_occ_s, jnp.inf).min(axis=1)

    # Ground special case: a huge sphere is locally its tangent plane
    # y = cy_g + r_g (sagitta <= Rh^2/(2 r_g) below it at horizontal
    # range Rh from the tangent point). When every unit direction points
    # steeply down and every origin is above the plane, the plane
    # distance (plus sagitta) upper-bounds the ground-hit distance.
    g = jnp.argmax(jnp.abs(radii))
    r_g = jnp.abs(radii)[g]
    y_t = cy[g] + r_g                    # tangent-plane height
    wy_hi = stats["wy_hi"]
    oy_rel = stats["oy_hi"] - y_t
    down = (r_g > 100.0) & (wy_hi < -0.05) & (oy_rel > stats["ro"])
    wy_safe = jnp.where(down, -wy_hi, 1.0)
    s_plane = (oy_rel + stats["ro"]) / wy_safe
    rh = (jnp.sqrt((stats["o0x"] - cx[g]) ** 2
                   + (stats["o0z"] - cz[g]) ** 2)
          + stats["ro"] + s_plane)
    drop = rh * rh / (2.0 * r_g)
    s_g = (oy_rel + stats["ro"] + drop) / wy_safe + _MARGIN
    s_occ = jnp.minimum(s_occ, jnp.where(down, s_g, jnp.inf))

    keep &= ~(near > (s_occ[:, None] * (1.0 + 1e-4) + _MARGIN))

    # Wide/degenerate/empty blocks: trust nothing, keep everything.
    keep |= (~narrow & (stats["n"] > 0))[:, None]
    keep &= (stats["n"] > 0)[:, None]

    # --- mask -> ascending index lists -------------------------------
    # Dense-algebra compaction: no jnp.sort, no cumsum (lane-crossing
    # scans/sorts are slow on the VPU). rank = inclusive masked cumsum
    # via a triangular matmul (integers < 2^24, exact in f32), then the
    # list is a one-hot contraction of ids against rank.
    l_round = -(-s // UNROLL_LIST) * UNROLL_LIST
    keepf = keep.astype(jnp.float32)
    tri = (jnp.arange(s)[:, None] <= jnp.arange(s)[None, :]).astype(
        jnp.float32)
    rank = (keepf @ tri).astype(jnp.int32) - 1          # (B, S), 0-based
    oh = (keep[:, :, None]
          & (rank[:, :, None]
             == jnp.arange(l_round)[None, None, :])).astype(jnp.float32)
    ids = jnp.arange(s, dtype=jnp.float32)
    lists = jnp.einsum("bsl,s->bl", oh, ids).astype(jnp.int32)
    counts = keep.sum(axis=1).astype(jnp.int32)
    counts = -(-counts // UNROLL_LIST) * UNROLL_LIST
    # entries at/after the true count are pads -> the id-S pad sphere
    lists = jnp.where(jnp.arange(l_round)[None, :]
                      < keep.sum(axis=1).astype(jnp.int32)[:, None],
                      lists, jnp.int32(s))
    return counts, lists


TILE = 32  # tile edge for the primary-pool pixel swizzle (power of two)


def virtual_grid(width: int, height: int, tile: int = TILE):
    """Padded tile grid: (tiles_x, tiles_y, virtual pixel count)."""
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    return tiles_x, tiles_y, tiles_x * tiles_y * tile * tile


def tile_pixel(vp, width: int, height: int, tile: int = TILE):
    """Virtual (tile-order) pixel index -> (row-major pixel id, valid).

    Tiles are row-major over a PADDED tile grid; pixels row-major inside
    each tile. Virtual pixels outside the true image return valid=False
    (their tasks resolve instantly; padding waste is < 2% for the
    shipped configs). Closed-form integer arithmetic only -- a lookup
    table would cost a per-lane gather (~80 ns/element on v5e).
    """
    tiles_x = -(-width // tile)
    tile_sz = tile * tile
    t_id = vp // tile_sz
    o = vp - t_id * tile_sz
    ty = t_id // tiles_x
    tx = t_id - ty * tiles_x
    oy = o // tile
    oxs = o - oy * tile
    py = ty * tile + oy
    px = tx * tile + oxs
    valid = (px < width) & (py < height)
    pid = jnp.where(valid, py * width + px, 0)
    return pid, valid
