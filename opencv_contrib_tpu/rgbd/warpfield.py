"""DynaFu warp field: dual-quaternion blended deformation nodes + nonrigid
fitting.

Reference anchors: rgbd/src/warpfield.cpp (node graph, k-NN blending),
rgbd/src/dqb.cpp (dual quaternion blending), rgbd/src/nonrigid_icp.cpp
(per-node point-to-plane GN with regularization). The reference gates
DynaFu as experimental; this provides the same building blocks.

TPU-first: node k-NN is a dense distance matmul + top_k (node counts are
hundreds, dense beats trees on the MXU); DQB is closed-form quaternion
math vmapped over points; nonrigid fitting optimizes ALL node transforms
jointly by autodiff on the blended point-to-plane + ARAP energy — JAX's
jacobians replace the reference's hand-assembled sparse GN system.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3


class WarpField(NamedTuple):
    nodes: jnp.ndarray  # (N, 3) node positions (canonical frame)
    xi: jnp.ndarray  # (N, 6) per-node se3 (w, v)
    sigma: jnp.ndarray  # () influence radius


def make_warpfield(nodes, sigma: float = 0.1) -> WarpField:
    nodes = jnp.asarray(nodes, jnp.float32)
    return WarpField(nodes, jnp.zeros((nodes.shape[0], 6)), jnp.asarray(sigma, jnp.float32))


def _xi_to_dq(xi):
    """se3 -> unit dual quaternion (q_r, q_d). dqb.cpp's UnitDualQuaternion."""
    T = se3.exp_se3(xi)
    R, t = se3.mat_to_rt(T)
    qr = se3.mat_to_quat(R)  # (w, x, y, z)
    tq = jnp.concatenate([jnp.zeros(1), t])
    qd = 0.5 * se3.quat_mul(tq, qr)
    return qr, qd


def _dq_apply(qr, qd, p):
    """Apply a (possibly non-unit, blended) dual quaternion to points."""
    n = jnp.linalg.norm(qr) + 1e-9
    qr = qr / n
    qd = qd / n
    R = se3.quat_to_mat(qr)
    # translation = 2 * qd * conj(qr), vector part
    tq = 2.0 * se3.quat_mul(qd, se3.quat_conj(qr))
    t = tq[1:]
    return p @ R.T + t


@partial(jax.jit, static_argnames=("k",))
def warp_points(wf: WarpField, pts, k: int = 4):
    """DQB-blend the k nearest nodes per point and apply (warpfield.cpp
    applyWarp). pts (P, 3) -> (P, 3)."""
    qr, qd = jax.vmap(_xi_to_dq)(wf.xi)  # (N, 4), (N, 4)
    d2 = ((pts[:, None] - wf.nodes[None]) ** 2).sum(-1)  # (P, N)
    negd, idx = jax.lax.top_k(-d2, k)  # (P, k)
    w = jnp.exp(negd / (2 * wf.sigma**2))
    w = w / (w.sum(-1, keepdims=True) + 1e-9)
    # sign-align the k rotation quats to the nearest node's before blending
    qr_k = qr[idx]  # (P, k, 4)
    qd_k = qd[idx]
    sign = jnp.sign(jnp.sum(qr_k * qr_k[:, :1], axis=-1, keepdims=True) + 1e-12)
    qr_b = (qr_k * sign * w[..., None]).sum(1)
    qd_b = (qd_k * sign * w[..., None]).sum(1)
    return jax.vmap(_dq_apply)(qr_b, qd_b, pts)


def _energy(xi, wf: WarpField, src, tgt, tgt_normals, node_nbrs, k: int, lam: float):
    wfx = wf._replace(xi=xi)
    warped = warp_points(wfx, src, k=k)
    r = ((warped - tgt) * tgt_normals).sum(-1)
    data = jnp.mean(r * r)
    # ARAP-lite regularization: neighboring nodes should transform each
    # other's positions consistently (nonrigid_icp.cpp regularization term)
    Ti = jax.vmap(se3.exp_se3)(xi)  # (N, 4, 4)
    pj = wf.nodes[node_nbrs]  # (N, M, 3)

    def apply_T(T, p):
        return p @ T[:3, :3].T + T[:3, 3]

    via_i = jax.vmap(lambda T, ps: jax.vmap(lambda p: apply_T(T, p))(ps))(Ti, pj)
    via_j = jax.vmap(lambda Ts, ps: jax.vmap(apply_T)(Ts, ps))(Ti[node_nbrs], pj)
    reg = jnp.mean(((via_i - via_j) ** 2).sum(-1))
    return data + lam * reg


def node_neighbors(nodes, m: int = 4):
    """(N, m) nearest-node graph (excluding self)."""
    d2 = ((nodes[:, None] - nodes[None]) ** 2).sum(-1)
    d2 = d2 + jnp.eye(nodes.shape[0]) * 1e9
    _, idx = jax.lax.top_k(-d2, m)
    return idx


@partial(jax.jit, static_argnames=("k", "iters"))
def fit(wf: WarpField, src, tgt, tgt_normals, node_nbrs, k: int = 4,
        iters: int = 30, lr: float = 0.05, lam: float = 1.0):
    """Nonrigid fitting: gradient descent on the blended point-to-plane +
    regularization energy (nonrigid_icp.cpp estimateWarpNodes' role).
    src/tgt (P, 3) correspondences, tgt_normals (P, 3)."""
    g = jax.grad(_energy)

    def body(xi, _):
        return xi - lr * g(xi, wf, src, tgt, tgt_normals, node_nbrs, k, lam), None

    xi, _ = jax.lax.scan(body, wf.xi, None, length=iters)
    return wf._replace(xi=xi)
