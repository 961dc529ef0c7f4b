"""Submap sharding: distribute map blocks over hosts, exchange boundary
constraints via collectives.

The reference's LargeKinFu keeps all submaps in one process (submap.hpp,
SURVEY §5.7c names it the precedent for map-block partitioning). Here the
submap POSE GRAPH is the shared small state and the expensive per-submap
work (constraint residual evaluation over shared-frame point sets) is
sharded over a mesh axis: each device owns n_submaps/n_devices submaps'
boundary point sets; the reduced 6x6-block normal equations are psum'd —
the same structure as dist_ba's reduced camera system.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from opencv_contrib_tpu.core import se3


def assign_submaps(n_submaps: int, mesh: Mesh, axis: str = "sp"):
    """Round-robin submap -> shard assignment (padded to a multiple of the
    axis size). Returns (owner (N,), n_per_shard)."""
    n = mesh.shape[axis]
    per = -(-n_submaps // n)
    owner = np.arange(per * n) // per
    return owner[:n_submaps], per


def sharded_constraint_step(mesh: Mesh, axis: str = "sp"):
    """Build a jitted one-step Gauss-Newton update for submap poses from
    sharded boundary observations.

    Inputs (per call):
      poses (S, 4, 4)      — replicated current submap poses (world<-submap)
      pts   (S, M, 3)      — shard-owned boundary points, in OWNER submap coords
      tgt   (S, M, 3)      — the same physical points in NEIGHBOR submap coords
      nbr   (S,)           — neighbor submap index per owner
      w     (S, M)         — point weights (0 pads)

    Residual per point: T_own @ p - T_nbr @ q (world-frame disagreement of
    the shared boundary geometry). Each shard builds its submaps' 6-vec
    gradient contributions; a psum over the axis forms the global system —
    ICI traffic is 6 floats per submap, not the point sets.
    """

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def step(poses, pts, tgt, nbr, w):
        S_local = pts.shape[0]
        S = poses.shape[0]

        def per_submap(i, p, q, j, wi):
            T_i = poses[i]
            T_j = poses[j]
            pw = p @ T_i[:3, :3].T + T_i[:3, 3]
            qw = q @ T_j[:3, :3].T + T_j[:3, 3]
            r = (pw - qw) * wi[:, None]  # (M, 3)
            # J wrt owner twist (w, v): dr = -[pw]_x dw + dv
            Jw = -se3.hat(pw)  # (M, 3, 3)
            Jv = jnp.broadcast_to(jnp.eye(3), Jw.shape)
            J = jnp.concatenate([Jw, Jv], axis=-1) * wi[:, None, None]  # (M, 3, 6)
            H = jnp.einsum("mik,mil->kl", J, J)
            g = jnp.einsum("mik,mi->k", J, r)
            return H, g

        my = jax.lax.axis_index(axis)
        ids = my * S_local + jnp.arange(S_local)
        Hs, gs = jax.vmap(per_submap)(ids, pts, tgt, nbr, w)
        # scatter local blocks into the global (S, 6, 6) system and psum
        H_all = jnp.zeros((S, 6, 6)).at[ids].set(Hs)
        g_all = jnp.zeros((S, 6)).at[ids].set(gs)
        H_all = jax.lax.psum(H_all, axis)
        g_all = jax.lax.psum(g_all, axis)
        # solve per-submap 6x6 (block-Jacobi step; submap 0 fixed)
        damp = 1e-6 * jnp.eye(6)

        def solve(H, g):
            return -jnp.linalg.solve(H + damp + 1e-9 * jnp.eye(6), g)

        dx = jax.vmap(solve)(H_all, g_all)  # (S, 6)
        dx = dx.at[0].set(0.0)
        new_poses = jax.vmap(lambda T, x: se3.exp_se3(x) @ T)(poses, dx)
        return new_poses

    return jax.jit(step)


def optimize_submaps(poses, pts, tgt, nbr, w, mesh: Mesh, n_iters: int = 10, axis: str = "sp"):
    """Run n_iters sharded GN steps. Arguments as in sharded_constraint_step,
    already padded so S is divisible by the axis size."""
    step = sharded_constraint_step(mesh, axis)
    poses = jnp.asarray(poses)
    for _ in range(n_iters):
        poses = step(poses, pts, tgt, nbr, w)
    return poses
