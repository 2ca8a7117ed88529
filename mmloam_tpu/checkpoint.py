"""Checkpoint / resume for the LIO state.

The reference has NO state serialization (SURVEY.md §5.4: map PCD dumps are
commented out, a crash loses the session).  Because the engine's entire
state — pose window, biases, gravity, voxel maps, marginalization prior,
init buffers — is one pytree, checkpointing is a flat array save:

    checkpoint.save(path, state)
    state = checkpoint.restore(path, template_state)

Plain .npz is used (no orbax dependency): states are O(100 MB) and written
rarely; restore validates shapes/dtypes against a template built from the
same config.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save(path, state):
    """Write a pytree state to `path` (.npz)."""
    arrays, _ = _flatten_with_paths(state)
    np.savez_compressed(path, **arrays)


def restore(path, template):
    """Load a state saved by `save`, validated against `template`'s
    structure/shapes (build the template with `pipeline.init_state(cfg)`)."""
    data = np.load(path)
    arrays, treedef = _flatten_with_paths(template)
    leaves = []
    for key, tmpl in arrays.items():
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != {tmpl.shape} "
                "(config mismatch?)")
        leaves.append(jnp.asarray(arr.astype(tmpl.dtype)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
