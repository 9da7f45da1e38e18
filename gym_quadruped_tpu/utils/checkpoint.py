"""Batched EnvState checkpoint: save/restore the full state pytree as .npz.

SURVEY.md §5 (checkpoint/resume): the reference persists trajectories via HDF5
(utils/data/h5.py reproduces that schema); this module adds the batched-runtime
counterpart — an exact snapshot of a (possibly vmapped) EnvState pytree,
including per-env PRNG keys and sensor states, so a long rollout can resume
bit-exactly after a restart.

Arrays are keyed by their pytree key path, so any registered-dataclass pytree
round-trips; restore() rebuilds against a structurally-identical example (the
state returned by env.reset provides one).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax


def _path_str(kp) -> str:
    return jax.tree_util.keystr(kp)


def save(path, state) -> None:
    """Write a state pytree (leaves: jax/numpy arrays) to `path` (.npz)."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for kp, leaf in leaves:
        arrays[_path_str(kp)] = np.asarray(leaf)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def restore(path, like):
    """Load a pytree saved by save(); `like` supplies the structure (and leaf
    dtypes for weak-typed scalars). Raises KeyError on structure mismatch."""
    with np.load(path) as data:
        leaves_like, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for kp, ref in leaves_like:
            key = _path_str(kp)
            if key not in data:
                raise KeyError(f'checkpoint {path} missing leaf {key}')
            arr = data[key]
            if arr.shape != np.shape(ref):
                raise KeyError(
                    f'checkpoint leaf {key} shape {arr.shape} != {np.shape(ref)}')
            leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(ref).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)
