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
             sphere sample  <- fold_in(kb, 0)
             RR uniform     <- fold_in(kb, 1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TAG_JITTER = 0
TAG_LENS = 1
TAG_BOUNCE = 2  # bounce b uses tag TAG_BOUNCE + b


def ray_key(base_key, pixel_id, sample_id):
    """Per-(pixel, sample) key; pixel_id/sample_id may be arrays (vmapped)."""
    return jax.random.fold_in(jax.random.fold_in(base_key, pixel_id), sample_id)


def bounce_key(rkey, bounce):
    return jax.random.fold_in(rkey, TAG_BOUNCE + bounce)


def jitter_uv(rkey):
    """Sub-pixel jitter in [0,1)^2 (main.cxx:199-200; cuda_impl.cu:370-371)."""
    return jax.random.uniform(jax.random.fold_in(rkey, TAG_JITTER), (2,))


def unit_vector(key):
    """Uniform direction on the unit sphere (analytic, no rejection loop).

    Distributionally identical to the reference's normalized
    rejection-sampled point in the unit ball (cuda_impl.cu:42-56 +
    normalize at cuda_impl.cu:206).
    """
    v = jax.random.normal(key, (3,))
    n = jnp.sqrt(jnp.sum(v * v))
    # Guard against the (measure-zero) all-zeros draw.
    return jnp.where(n > 1e-12, v / jnp.where(n > 1e-12, n, 1.0),
                     jnp.array([1.0, 0.0, 0.0]))


def in_unit_sphere(key):
    """Uniform point in the unit ball (analytic).

    Same distribution as the reference's rejection sampler
    (raytracer.hxx:32-43) without the data-dependent loop: a uniform unit
    direction scaled by U^(1/3).
    """
    kd, kr = jax.random.split(key)
    d = unit_vector(kd)
    r = jax.random.uniform(kr) ** (1.0 / 3.0)
    return d * r


def in_unit_disk(key):
    """Uniform point in the unit disk (for true thin-lens defocus)."""
    kt, kr = jax.random.split(key)
    theta = jax.random.uniform(kt) * (2.0 * jnp.pi)
    r = jnp.sqrt(jax.random.uniform(kr))
    return jnp.array([jnp.cos(theta), jnp.sin(theta)]) * r


def rr_uniform(key):
    """Russian-roulette uniform in [0,1) (raytracer.hxx:182-185)."""
    return jax.random.uniform(key)
