"""Pose graph optimization: SE(3) nodes, relative-pose edges, LM.

Parity: rgbd/src/pose_graph.cpp — PoseGraphImpl (:108-201 Pose3d/Node/Edge),
optimize (:576): custom Levenberg-Marquardt over a 6x6-block sparse Hessian
with Jacobi scaling and direct solve (sparse_block_matrix.hpp:145
SimplicialLDLT).

TPU-first: edges live in padded arrays (E, ...) with a validity mask; the
residual/Jacobian build is one vmap over edges; the Hessian is assembled
dense-block (N*6 x N*6 — pose graphs here are 10s-100s of nodes, where a
dense Cholesky on the MXU beats sparse scalar code by a wide margin) and the
LM loop is a lax.scan with in-graph accept/reject. First node is gauge-fixed
(pose_graph.cpp fixes node 0).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3


class PoseGraph(NamedTuple):
    poses: jnp.ndarray  # (N, 4, 4) node poses (world <- node)
    edges_ij: jnp.ndarray  # (E, 2) int32 node indices
    edges_T: jnp.ndarray  # (E, 4, 4) measured relative pose: node_j in node_i
    edges_info: jnp.ndarray  # (E, 6, 6) information matrices
    edges_valid: jnp.ndarray  # (E,) bool
    fixed: jnp.ndarray  # (N,) bool — gauge-fixed nodes


def make_graph(poses, edges_ij, edges_T, edges_info=None, edges_valid=None, fixed=None) -> PoseGraph:
    poses = jnp.asarray(poses, jnp.float32)
    edges_ij = jnp.asarray(edges_ij, jnp.int32)
    E = edges_ij.shape[0]
    N = poses.shape[0]
    if edges_info is None:
        edges_info = jnp.broadcast_to(jnp.eye(6), (E, 6, 6))
    if edges_valid is None:
        edges_valid = jnp.ones(E, bool)
    if fixed is None:
        fixed = jnp.zeros(N, bool).at[0].set(True)
    return PoseGraph(poses, edges_ij, jnp.asarray(edges_T, jnp.float32), jnp.asarray(edges_info, jnp.float32), edges_valid, fixed)


def edge_residual(Ti, Tj, Tij_meas):
    """r = log( Tij_meas^-1 * (Ti^-1 Tj) ) in se(3) — the standard
    between-factor residual (pose_graph.cpp poseError)."""
    return se3.log_se3(se3.inverse(Tij_meas) @ (se3.inverse(Ti) @ Tj))


def total_cost(g: PoseGraph, poses=None) -> jnp.ndarray:
    if poses is None:
        poses = g.poses
    Ti = poses[g.edges_ij[:, 0]]
    Tj = poses[g.edges_ij[:, 1]]
    r = jax.vmap(edge_residual)(Ti, Tj, g.edges_T)
    w = g.edges_valid.astype(jnp.float32)
    return 0.5 * jnp.sum(w[:, None] * r * jnp.einsum("eij,ej->ei", g.edges_info, r))


@partial(jax.jit, static_argnames=("n_iters",))
def optimize(g: PoseGraph, n_iters: int = 30, lam0: float = 1e-4) -> tuple[PoseGraph, jnp.ndarray]:
    """LM over all node poses; left-multiplied se(3) increments; dense block
    Hessian assembled by scatter-add; gauge-fixed nodes pinned.

    Returns (optimized graph, (initial_cost, final_cost))."""
    N = g.poses.shape[0]
    E = g.edges_ij.shape[0]

    def residuals_and_jac(poses):
        Ti = poses[g.edges_ij[:, 0]]
        Tj = poses[g.edges_ij[:, 1]]

        def one(Ti_, Tj_, Tm_):
            def res(xi_i, xi_j):
                Pi = se3.exp_se3(xi_i) @ Ti_
                Pj = se3.exp_se3(xi_j) @ Tj_
                return edge_residual(Pi, Pj, Tm_)

            z = jnp.zeros(6)
            r = res(z, z)
            Jii, Jjj = jax.jacfwd(res, argnums=(0, 1))(z, z)
            return r, Jii, Jjj

        return jax.vmap(one)(Ti, Tj, g.edges_T)

    def lm_step(carry, _):
        poses, lam = carry
        r, Ji, Jj = residuals_and_jac(poses)  # (E,6), (E,6,6), (E,6,6)
        w = g.edges_valid.astype(jnp.float32)
        Info = g.edges_info * w[:, None, None]

        # weighted blocks
        JiI = jnp.einsum("eki,ekl->eil", Ji, Info)  # Ji^T Info
        JjI = jnp.einsum("eki,ekl->eil", Jj, Info)
        Hii = jnp.einsum("eil,elj->eij", JiI, Ji)
        Hjj = jnp.einsum("eil,elj->eij", JjI, Jj)
        Hij = jnp.einsum("eil,elj->eij", JiI, Jj)
        bi = -jnp.einsum("eil,el->ei", JiI, r)
        bj = -jnp.einsum("eil,el->ei", JjI, r)

        i_idx = g.edges_ij[:, 0]
        j_idx = g.edges_ij[:, 1]
        H = jnp.zeros((N, 6, N, 6))
        H = H.at[i_idx, :, i_idx, :].add(Hii)
        H = H.at[j_idx, :, j_idx, :].add(Hjj)
        H = H.at[i_idx, :, j_idx, :].add(Hij)
        H = H.at[j_idx, :, i_idx, :].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((N, 6)).at[i_idx].add(bi).at[j_idx].add(bj)

        # gauge fixing + damping
        free = (~g.fixed).astype(jnp.float32)
        Hf = H * free[:, None, None, None] * free[None, None, :, None]
        idx = jnp.arange(N)
        diag = jnp.maximum(jnp.abs(jnp.einsum("nini->ni", H)), 1e-6)
        Hf = Hf.at[idx, :, idx, :].add(jax.vmap(jnp.diag)(lam * diag * free[:, None]))
        Hf = Hf.at[idx, :, idx, :].add(jax.vmap(jnp.diag)((1.0 - free)[:, None] * jnp.ones(6)))
        b = b * free[:, None]

        dx = jnp.linalg.solve(Hf.reshape(N * 6, N * 6) + 1e-9 * jnp.eye(N * 6), b.reshape(-1)).reshape(N, 6)
        dx = dx * free[:, None]
        new_poses = jax.vmap(lambda x, T: se3.exp_se3(x) @ T)(dx, poses)
        c_old = total_cost(g, poses)
        c_new = total_cost(g, new_poses)
        accept = c_new < c_old
        poses = jnp.where(accept, new_poses, poses)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9), jnp.minimum(lam * 4.0, 1e8))
        return (poses, lam), None

    c0 = total_cost(g)
    (poses, _), _ = jax.lax.scan(lm_step, (g.poses, jnp.asarray(lam0)), None, length=n_iters)
    c1 = total_cost(g, poses)
    return g._replace(poses=poses), jnp.stack([c0, c1])
