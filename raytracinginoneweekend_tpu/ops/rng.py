"""Counter-based RNG discipline shared by the vectorized renderer and the
scalar oracle.

The reference uses a shared (racy) ``std::mt19937`` on CPU (main.cxx:33-36,
SURVEY R1) and a per-pixel xorshift32 on CUDA (cuda_impl.cu:13-56, with the
pixel-0-seed-0 degeneracy, SURVEY Q5). Neither maps to TPU: data-dependent
rejection loops and mutable generator state break ``jit``. The TPU-native
replacement is JAX's counter-based threefry: every random draw is a pure
function of ``(base_key, pixel_id, sample_id, bounce, tag)``.

This gives us, for free, the properties the reference lacks:
  - determinism and reproducibility at fixed key,
  - *shard invariance*: the key depends only on global pixel/sample ids,
    never on device index, so a 1-chip and an N-chip render are bitwise
    identical (the honest basis for scaling numbers, SURVEY section 7),
  - no cross-thread races (R1 cannot exist).

Draw-order contract (both the wavefront renderer and ``oracle/`` follow it):
  ray_key  = fold_in(fold_in(base, pixel_id), sample_id)
  jitter   : uniform(fold_in(ray_key, TAG_JITTER), (2,))        # pixel jitter
  lens     : fold_in(ray_key, TAG_LENS)                          # defocus disk
  bounce b : kb = fold_in(ray_key, TAG_BOUNCE + b)
             u  = uniform(kb, (4,))  -- ONE counter-based draw:
             scatter sample <- u[0:3] (polar; "unit" uses u[0:2], the
                                       ball variant scales by u[2]^(1/3))
             RR uniform     <- u[3]

COST is a first-class property of this contract (the regen/shade RNG is
the wavefront engine's per-iteration elementwise tax; profiled ~22% of
the v5e headline frame): every sampler draws uniforms straight off its
key's counter stream (one threefry block per 2 draws) and maps them
analytically -- no key splits, no per-draw fold chains, no Gaussian
erfinv, no normalization. The polar map is distributionally identical to
the normalized-Gaussian direction it replaced, and per-ray radiance
stays engine-invariant because every engine and the oracle share these
functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TAG_JITTER = 0
TAG_LENS = 1
TAG_BOUNCE = 2  # bounce b uses tag TAG_BOUNCE + b

TWO_PI = 6.283185307179586


def ray_key(base_key, pixel_id, sample_id):
    """Per-(pixel, sample) key; pixel_id/sample_id may be arrays (vmapped)."""
    return jax.random.fold_in(jax.random.fold_in(base_key, pixel_id), sample_id)


def bounce_key(rkey, bounce):
    return jax.random.fold_in(rkey, TAG_BOUNCE + bounce)


def jitter_uv(rkey):
    """Sub-pixel jitter in [0,1)^2 (main.cxx:199-200; cuda_impl.cu:370-371)."""
    return jax.random.uniform(jax.random.fold_in(rkey, TAG_JITTER), (2,))


def unit_from_uv(u0, u1):
    """Uniform unit direction from two uniforms (polar/Archimedes map).

    z uniform on [-1, 1), azimuth uniform: distributionally identical to
    a normalized Gaussian triple, with no erfinv and no normalization.
    Works elementwise on scalars or (R, 128) planes alike. Returns a
    tuple (x, y, z) of components.
    """
    z = 2.0 * u0 - 1.0
    rho = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u1
    return rho * jnp.cos(phi), rho * jnp.sin(phi), z


def disk_from_uv(u0, u1):
    """Uniform point in the unit disk from two uniforms (componentwise)."""
    theta = TWO_PI * u0
    r = jnp.sqrt(u1)
    return jnp.cos(theta) * r, jnp.sin(theta) * r


def unit_vector(key):
    """Uniform direction on the unit sphere (analytic, no rejection loop).

    Distributionally identical to the reference's normalized
    rejection-sampled point in the unit ball (cuda_impl.cu:42-56 +
    normalize at cuda_impl.cu:206).
    """
    u = jax.random.uniform(key, (2,))
    return jnp.stack(unit_from_uv(u[0], u[1]))


def in_unit_sphere(key):
    """Uniform point in the unit ball (analytic).

    Same distribution as the reference's rejection sampler
    (raytracer.hxx:32-43) without the data-dependent loop: a uniform unit
    direction scaled by U^(1/3).
    """
    u = jax.random.uniform(key, (3,))
    x, y, z = unit_from_uv(u[0], u[1])
    r = u[2] ** (1.0 / 3.0)
    return jnp.stack((x, y, z)) * r


def in_unit_disk(key):
    """Uniform point in the unit disk (for true thin-lens defocus)."""
    u = jax.random.uniform(key, (2,))
    return jnp.stack(disk_from_uv(u[0], u[1]))


def bounce_draws(kb, sample: str):
    """All per-bounce randomness from ONE key: (scatter vec (3,), rr u).

    sample: "unit" (normalized direction, CUDA semantics) or "ball"
    (unnormalized point in the unit sphere, CPU semantics).
    """
    u = jax.random.uniform(kb, (4,))
    x, y, z = unit_from_uv(u[0], u[1])
    vec = jnp.stack((x, y, z))
    if sample != "unit":
        vec = vec * u[2] ** (1.0 / 3.0)
    return vec, u[3]


def rr_uniform(key):
    """Russian-roulette uniform in [0,1) (raytracer.hxx:182-185)."""
    return jax.random.uniform(key)
