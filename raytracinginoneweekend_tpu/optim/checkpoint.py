"""Checkpoint/resume for inverse rendering (params + optimizer state).

The reference persists nothing but the final PPM (SURVEY section 5
"checkpoint/resume: absent"); the optimization loop added here needs real
save/restore. Format: a single .npz of flattened pytree leaves plus the
step counter -- dependency-free and host-portable. The pytree *structure*
is reconstructed from a template on load (the caller always has
params/optimizer available to build one), so no pickled treedefs.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, params: dict, opt_state, step: int) -> None:
    """Atomically write params + optimizer state + step to ``path`` (.npz)."""
    p_leaves, _ = _flatten(params)
    o_leaves, _ = _flatten(opt_state)
    arrays = {"__step__": np.asarray(step, np.int64)}
    for i, leaf in enumerate(p_leaves):
        arrays[f"p{i}"] = np.asarray(leaf)
    for i, leaf in enumerate(o_leaves):
        arrays[f"o{i}"] = np.asarray(leaf)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic on POSIX


def load_checkpoint(path: str, params_template: dict, opt_state_template):
    """Restore (params, opt_state, step) shaped like the templates.

    Templates supply pytree structure (and device placement via jnp
    conversion by the caller); leaf count/shape mismatches raise.
    """
    with np.load(path) as data:
        step = int(data["__step__"])
        p_leaves, p_def = _flatten(params_template)
        o_leaves, o_def = _flatten(opt_state_template)
        new_p = [data[f"p{i}"] for i in range(len(p_leaves))]
        new_o = [data[f"o{i}"] for i in range(len(o_leaves))]
    for tmpl, new in zip(p_leaves + o_leaves, new_p + new_o):
        if np.shape(tmpl) != np.shape(new):
            raise ValueError(
                f"checkpoint leaf shape {np.shape(new)} != template "
                f"{np.shape(tmpl)}")
        tdt = np.asarray(tmpl).dtype
        if tdt != np.asarray(new).dtype:
            raise ValueError(
                f"checkpoint leaf dtype {np.asarray(new).dtype} != "
                f"template {tdt}")
    params = jax.tree_util.tree_unflatten(p_def, new_p)
    opt_state = jax.tree_util.tree_unflatten(o_def, new_o)
    return params, opt_state, step
