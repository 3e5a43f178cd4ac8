"""Gamma correction + 8-bit quantization (SURVEY #22).

Reference: pow(color, 1/2.2) then *255 and a raw uint8 cast with NO clamp
(main.cxx:39-45, 77-85; cuda_impl.cu:85-99). Under quirk Q6 the CPU sky can
exceed 1.0, making the cast overflow UB. Default here clamps; ``clamp=False``
reproduces the raw modular cast for parity experiments.
"""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 1.0 / 2.2


def to_srgb(image):
    """Gamma-encode a linear float image (negative-safe)."""
    return jnp.power(jnp.maximum(image, 0.0), GAMMA)


def to_u8(image, clamp: bool = True):
    """Gamma + quantize to uint8. image: (..., 3) linear float."""
    srgb = to_srgb(image) * 255.0
    if clamp:
        srgb = jnp.clip(srgb, 0.0, 255.0)
        return srgb.astype(jnp.uint8)
    # Reference behavior: raw cast (modular wrap on overflow).
    return srgb.astype(jnp.int32).astype(jnp.uint8)
