"""Inverse rendering: optimize scene parameters from target pixels.

The reference renders forward only; differentiability is the headline
capability this framework adds (BASELINE config 5: "optimize sphere centers
+ albedo/fuzz/ior from target image via pixel gradients").
"""

from .inverse import (  # noqa: F401
    DIFFERENTIABLE_LEAVES, params_from_scene, scene_with_params, render_loss,
    render_pixels_vjp, make_train_step, fit)
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
