"""Checkpoint/resume of (distributed) SLAM/SfM state.

Parity role: the reference's persistence layer — cv::Algorithm read/write
FileStorage + the hdf module's bulk-array store (hdf5.hpp:56-198, SURVEY
§5.4) — extended with what the reference lacks: multi-host
checkpoint-restart for preemptible pods. Uses orbax when available (the
production path: async, sharding-aware) with an npz fallback that handles
any pytree of arrays (utils.io's named store handles flat dicts).
"""

from __future__ import annotations

import os

import numpy as np
import jax

try:  # orbax is baked into the image; guard anyway per environment rules
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_pytree(path: str, tree, use_orbax: bool | None = None) -> str:
    """Checkpoint any pytree of arrays. Sharded jax.Arrays are saved with
    their sharding by orbax; the npz fallback gathers to host."""
    path = os.path.abspath(path)
    if use_orbax is None:
        use_orbax = _HAS_ORBAX
    if use_orbax and _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return path
    flat, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        treedef=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )
    return path if path.endswith(".npz") else path + ".npz"


def restore_pytree(path: str, like, use_orbax: bool | None = None):
    """Restore a checkpoint into the structure of `like` (arrays restored
    with like's shardings under orbax)."""
    path = os.path.abspath(path)
    if use_orbax is None:
        use_orbax = _HAS_ORBAX and os.path.isdir(path)
    if use_orbax and _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, like)
    f = np.load(path if path.endswith(".npz") else path + ".npz")
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    flat = [f[f"leaf_{i}"] for i in range(len(flat_like))]
    return jax.tree_util.tree_unflatten(treedef, flat)


def save_slam_state(path: str, volume=None, T_cw=None, posegraph=None, extra=None) -> str:
    """Convenience wrapper for the SLAM loop's resumable state (the
    'tracks, camera params, landmark blocks, volume units, optimizer state'
    checkpoint of SURVEY §5.4)."""
    tree = {}
    if volume is not None:
        tree["volume"] = volume
    if T_cw is not None:
        tree["T_cw"] = T_cw
    if posegraph is not None:
        tree["posegraph"] = posegraph
    if extra:
        tree.update(extra)
    return save_pytree(path, tree)
