"""Thin-lens camera as a pure-function pytree.

Re-expression of ``raytracer::camera`` (camera.hxx:19-77). The constructor
math is identical (basis from position/lookat/up, FOV half-angle tangent,
focus-distance-scaled film rectangle, camera.hxx:31-43). Ray generation is a
pure function of (camera, u, v, key) so it vmaps/shards trivially.

Defocus modes (static config, selects trace-time code):
  - "thinlens" (default): physically correct thin-lens -- offset sampled on
    the lens disk in the camera's (u,v) basis; direction re-aimed at the
    focal point. This is what the book intends.
  - "cuda": no defocus at all, offset = 0 (camera.hxx:48-49, quirk Q1:
    the CUDA path hardcodes zero even though an aperture is passed).
  - "cpu": the dead CPU path's quirky defocus (camera.hxx:51-53, quirk Q2):
    a point in the unit *sphere* scaled by lens_radius, with the offset
    built in WORLD axes as (u*rd.x, v*rd.y, 0) -- screen coords scale the
    offset. Reproduced for parity testing only.

Direction quirk Q11 (found reading camera.hxx:56; not in SURVEY's register):
the reference ray direction is ``lower_left + horizontal*u + vertical*(1-v)
- offset`` -- it never subtracts ``origin``, so for any camera not at the
world origin the direction is wrong by +origin. The active CUDA scene has
origin == 0 (cuda_impl.cu:348-352) so it renders correctly by luck. Modes
"cuda"/"cpu" reproduce the reference expression verbatim; "thinlens"
subtracts origin properly.

The v flip ``vertical*(1-v)`` (camera.hxx:56) is kept in all modes: v=0 is
the TOP image row, consistent with the reference's row-major pixel order
(cuda_impl.cu:363-364) and the PPM writer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import math3, rng


class Camera(NamedTuple):
    origin: jax.Array  # (3,)
    lower_left: jax.Array  # (3,)
    horizontal: jax.Array  # (3,)
    vertical: jax.Array  # (3,)
    basis_u: jax.Array  # (3,) lens-plane x axis
    basis_v: jax.Array  # (3,) lens-plane y axis
    lens_radius: jax.Array  # ()


def make_camera(position, lookat, up, aspect, vfov_degrees, aperture,
                focus_distance) -> Camera:
    """camera.hxx:24-44, verbatim math."""
    position = jnp.asarray(position, jnp.float32)
    lookat = jnp.asarray(lookat, jnp.float32)
    up = jnp.asarray(up, jnp.float32)

    theta = math3.radians(jnp.float32(vfov_degrees)) / 2.0
    height = jnp.tan(theta)
    width = height * aspect

    w = math3.normalize(position - lookat)
    u = math3.normalize(math3.cross(up, w))
    v = math3.normalize(math3.cross(w, u))

    lower_left = position - (u * width + v * height + w) * focus_distance
    horizontal = u * width * focus_distance * 2.0
    vertical = v * height * focus_distance * 2.0

    return Camera(
        origin=position,
        lower_left=lower_left,
        horizontal=horizontal,
        vertical=vertical,
        basis_u=u,
        basis_v=v,
        lens_radius=jnp.float32(aperture) / 2.0,
    )


def camera_ray(cam: Camera, u, v, key, mode: str = "thinlens",
               lens_uv=None):
    """Generate one primary ray. u, v are scalars; vmap for batches.

    Returns (origin (3,), direction (3,)). ``key`` is the ray's RAY KEY;
    lens draws use its TAG_LENS counter blocks (ops/rng.py contract v3;
    "cuda" mode draws nothing -- matching the reference's RNG
    consumption exactly matters for the oracle contract).

    lens_uv: optional pre-remapped (u0, u1) pair for the thinlens disk
    sample (the stratified-lens path, rng.stratify_lens_uv); None draws
    the iid pair from the ray key as usual.
    """
    film = cam.lower_left + cam.horizontal * u + cam.vertical * (1.0 - v)
    if mode == "cuda":
        # camera.hxx:48-49 + :56 (no -origin, quirk Q11).
        return cam.origin, film
    if mode == "cpu":
        # camera.hxx:51-56: unit-SPHERE sample, world-axis offset scaled by
        # screen (u,v); direction keeps quirk Q11 (no -origin).
        rd = rng.lens_sphere(key) * cam.lens_radius
        offset = jnp.stack([u * rd[0], v * rd[1], jnp.float32(0.0)])
        return cam.origin + offset, film - offset
    if mode == "thinlens":
        # True thin-lens: disk sample in the lens basis; correct direction.
        if lens_uv is not None:
            rd = jnp.stack(rng.disk_from_uv(*lens_uv)) * cam.lens_radius
        else:
            rd = rng.lens_disk(key) * cam.lens_radius
        offset = cam.basis_u * rd[0] + cam.basis_v * rd[1]
        return cam.origin + offset, film - cam.origin - offset
    if mode == "pinhole":
        return cam.origin, film - cam.origin
    raise ValueError(f"unknown camera mode: {mode!r}")


def reference_cuda_camera(width: int, height: int) -> Camera:
    """The camera the reference actually renders with (cuda_impl.cu:348-352):
    position (0,0,0) -> lookat (0,0,-1), vFOV 88, aperture .0625, focus 1."""
    return make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0),
                       float(width) / float(height), 88.0, 0.0625, 1.0)


def reference_cpu_camera(width: int, height: int) -> Camera:
    """The dead CPU path's camera (main.cxx:179-183)."""
    import numpy as np

    pos = np.array([-4.0, 3.2, 5.0])
    lookat = np.array([0.0, 1.0, 0.0])
    focus = float(np.linalg.norm(pos - lookat))
    return make_camera(pos, lookat, (0, 1, 0),
                       float(width) / float(height), 42.0, 0.0625, focus)
