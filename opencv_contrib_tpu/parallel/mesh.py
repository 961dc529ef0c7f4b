"""Mesh + sharding helpers.

Canonical axes:
- "dp": data parallel — frames, views, image batches.
- "sp": spatial/structure parallel — tracks, points, map blocks, pixels.

On a multi-host pod slice, build the mesh with jax.distributed initialized so
dp maps across hosts (DCN-friendly batch splits) and sp across the ICI ring.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_sp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_dp is None and n_sp is None:
        # favor sp (tracks/points usually dominate)
        n_dp = 1 if n < 4 else 2
        n_sp = n // n_dp
    elif n_dp is None:
        n_dp = n // n_sp
    elif n_sp is None:
        n_sp = n // n_dp
    arr = np.array(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(arr, ("dp", "sp"))


def shard(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def initialize_multihost(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """jax.distributed bring-up for a pod slice (no-op when single-process).

    On real multi-host TPU, call once per host before any jax op; the device
    mesh then spans all hosts' chips.
    """
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
