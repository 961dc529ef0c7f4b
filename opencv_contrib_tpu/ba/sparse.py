"""Sparse-observation bundle adjustment (the 5k-image-scale layout).

The dense (C, P) observation grid of ba.bundle is memory-infeasible at the
BASELINE 5k-camera / 10^5-track configuration (the Jacobian grid alone is
C*P*2*6 floats). Ceres works off CRS sparsity (reference:
sfm/src/libmv/simple_pipeline/bundle.cc:283-299 builds a compressed
residual block list); the TPU-native analog here is a FLAT observation
list with static capacity:

  obs_cam (N,) int32   camera id per observation
  obs_pt  (N,) int32   point id per observation
  obs_uv  (N, 2) f32   pixel measurement
  obs_ok  (N,) bool    validity (padding rows are False)

All Hessian blocks are segment-sums over this list (XLA sorted-scatter on
TPU; the obs axis shards over the mesh and GSPMD turns the segment-sums
into per-shard partials + psum — the distributed Schur structure):

  U_c = sum_{n: cam(n)=c} Jc_n^T Jc_n        (C, 6, 6)
  V_p = sum_{n: pt(n)=p} Jp_n^T Jp_n         (P, 3, 3)
  W_n = Jc_n^T Jp_n                          per-observation (N, 6, 3)

The camera system S = U - W V^-1 W^T is never materialized: the PCG
matvec streams over the observation list twice per iteration
(implicit-Schur, the ITERATIVE_SCHUR + SCHUR_JACOBI choice of
bundle.cc:617-623), so memory is O(N + C + P), not O(C*P) or O((6C)^2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ba.bundle import _project_obs
from opencv_contrib_tpu.core import se3


class SparseBAProblem(NamedTuple):
    cameras: jnp.ndarray  # (C, 6) [rvec | tvec]
    points: jnp.ndarray  # (P, 3)
    intr: jnp.ndarray  # (9,)
    obs_cam: jnp.ndarray  # (N,) int32
    obs_pt: jnp.ndarray  # (N,) int32
    obs_uv: jnp.ndarray  # (N, 2)
    obs_ok: jnp.ndarray  # (N,) bool


class SparseBAResult(NamedTuple):
    cameras: jnp.ndarray
    points: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


def from_dense(problem) -> SparseBAProblem:
    """Convert a dense-grid BAProblem (ba.bundle) to the flat layout.

    Host-side helper (data-dependent size); capacity = #valid entries
    rounded up to a multiple of 1024 for shape reuse across calls.
    """
    import numpy as np

    mask = np.asarray(problem.mask)
    c_idx, p_idx = np.nonzero(mask)
    n = len(c_idx)
    cap = max(1024, int(np.ceil(n / 1024)) * 1024)
    obs_cam = np.zeros(cap, np.int32)
    obs_pt = np.zeros(cap, np.int32)
    obs_uv = np.zeros((cap, 2), np.float32)
    obs_ok = np.zeros(cap, bool)
    obs_cam[:n] = c_idx
    obs_pt[:n] = p_idx
    obs_uv[:n] = np.asarray(problem.obs)[c_idx, p_idx]
    obs_ok[:n] = True
    return SparseBAProblem(
        cameras=problem.cameras, points=problem.points, intr=problem.intr,
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv), obs_ok=jnp.asarray(obs_ok),
    )


def _obs_residual_jac(cameras, points, intr, obs_cam, obs_pt, obs_uv, obs_ok):
    """Per-observation residual + Jacobians by gather-then-vmap.

    Returns r (N, 2), Jc (N, 2, 6), Jp (N, 2, 3); padding rows zeroed.
    """
    cams_n = cameras[obs_cam]  # (N, 6)
    pts_n = points[obs_pt]  # (N, 3)

    def one(cam6, X, uv):
        pred, (jc, jp) = (
            _project_obs(cam6, X, intr),
            jax.jacfwd(_project_obs, argnums=(0, 1))(cam6, X, intr),
        )
        return pred - uv, jc, jp

    r, Jc, Jp = jax.vmap(one)(cams_n, pts_n, obs_uv)
    w = obs_ok.astype(r.dtype)
    return r * w[:, None], Jc * w[:, None, None], Jp * w[:, None, None]


def sparse_cost(cameras, points, intr, obs_cam, obs_pt, obs_uv, obs_ok):
    cams_n = cameras[obs_cam]
    pts_n = points[obs_pt]
    pred = jax.vmap(lambda c, X: _project_obs(c, X, intr))(cams_n, pts_n)
    r = (pred - obs_uv) * obs_ok[:, None]
    return 0.5 * jnp.sum(r * r)


def rms_reprojection_error(problem: SparseBAProblem) -> jnp.ndarray:
    c = sparse_cost(problem.cameras, problem.points, problem.intr,
                    problem.obs_cam, problem.obs_pt, problem.obs_uv,
                    problem.obs_ok)
    n = jnp.maximum(jnp.sum(problem.obs_ok), 1)
    return jnp.sqrt(2.0 * c / n)


def _solve_sparse_pcg(r, Jc, Jp, obs_cam, obs_pt, lam, cam_free, pt_free,
                      C: int, P: int, n_cg: int):
    """Implicit-Schur PCG over the observation list.

    Blocks by segment-sum; the S matvec is two streamed passes over the
    list (gather x at cameras -> scatter into points -> gather back).
    """
    # per-obs blocks
    Uo = jnp.einsum("nki,nkj->nij", Jc, Jc)  # (N, 6, 6)
    Vo = jnp.einsum("nki,nkj->nij", Jp, Jp)  # (N, 3, 3)
    Wo = jnp.einsum("nki,nkj->nij", Jc, Jp)  # (N, 6, 3)
    bco = -jnp.einsum("nki,nk->ni", Jc, r)  # (N, 6)
    bpo = -jnp.einsum("nki,nk->ni", Jp, r)  # (N, 3)

    U = jax.ops.segment_sum(Uo, obs_cam, num_segments=C)  # (C, 6, 6)
    V = jax.ops.segment_sum(Vo, obs_pt, num_segments=P)  # (P, 3, 3)
    bc = jax.ops.segment_sum(bco, obs_cam, num_segments=C)
    bp = jax.ops.segment_sum(bpo, obs_pt, num_segments=P)

    dU = jnp.maximum(jnp.diagonal(U, axis1=1, axis2=2), 1e-6)
    dV = jnp.maximum(jnp.diagonal(V, axis1=1, axis2=2), 1e-6)
    U = U + jax.vmap(jnp.diag)(lam * dU)
    V = V + jax.vmap(jnp.diag)(lam * dV)
    Vinv = jnp.linalg.inv(V + (~pt_free)[:, None, None] * jnp.eye(3)[None] * 1e12)

    free = cam_free.astype(r.dtype)

    def matvec(x):  # x (C, 6)
        x = x * free[:, None]
        # wx_p = sum_{n->p} W_n^T x[cam_n]
        wtx = jnp.einsum("nij,ni->nj", Wo, x[obs_cam])  # (N, 3)
        wx = jax.ops.segment_sum(wtx, obs_pt, num_segments=P)  # (P, 3)
        vz = jnp.einsum("pij,pj->pi", Vinv, wx)  # (P, 3)
        # yx_c = sum_{n->c} W_n (V^-1 wx)[pt_n]
        wy = jnp.einsum("nij,nj->ni", Wo, vz[obs_pt])  # (N, 6)
        yx = jax.ops.segment_sum(wy, obs_cam, num_segments=C)  # (C, 6)
        sx = jnp.einsum("cij,cj->ci", U, x) - yx
        return sx * free[:, None] + x * (1.0 - free)[:, None]

    # rhs = bc - W V^-1 bp (one streamed pass)
    vbp = jnp.einsum("pij,pj->pi", Vinv, bp)
    rhs_o = jnp.einsum("nij,nj->ni", Wo, vbp[obs_pt])
    rhs = (bc - jax.ops.segment_sum(rhs_o, obs_cam, num_segments=C)) * free[:, None]

    # SCHUR_JACOBI preconditioner: diag blocks of S by segment-sum
    WVW = jnp.einsum("nij,njk,nlk->nil", Wo,
                     Vinv[obs_pt], Wo)  # (N, 6, 6)
    S_diag = U - jax.ops.segment_sum(WVW, obs_cam, num_segments=C)
    Minv = jnp.linalg.inv(S_diag + 1e-9 * jnp.eye(6)[None])

    def prec(x):
        return jnp.einsum("cij,cj->ci", Minv, x) * free[:, None] + x * (1.0 - free)[:, None]

    x = jnp.zeros_like(rhs)
    res = rhs - matvec(x)
    z = prec(res)
    p = z
    rz = jnp.sum(res * z)

    def cg_body(carry, _):
        x, res, p, rz = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        res = res - alpha * Ap
        z = prec(res)
        rz_new = jnp.sum(res * z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, res, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(cg_body, (x, res, p, rz), None, length=n_cg)
    dcam = x * free[:, None]
    # back-substitute points: dp = V^-1 (bp - W^T dcam)
    wdc = jnp.einsum("nij,ni->nj", Wo, dcam[obs_cam])
    wdc_p = jax.ops.segment_sum(wdc, obs_pt, num_segments=P)
    dpt = jnp.einsum("pij,pj->pi", Vinv, bp - wdc_p) * pt_free[:, None]
    return dcam, dpt


@partial(jax.jit, static_argnames=("n_iters", "fix_first_cam", "n_cg"))
def bundle_adjust_sparse(
    problem: SparseBAProblem,
    n_iters: int = 20,
    fix_first_cam: bool = True,
    cam_free: jnp.ndarray | None = None,
    pt_free: jnp.ndarray | None = None,
    lam0: float = 1e-4,
    n_cg: int = 30,
) -> SparseBAResult:
    """LM over the flat observation list; matches ba.bundle.bundle_adjust
    on equivalent problems (see tests/test_ba_sparse.py) while scaling to
    the 5k-camera BASELINE config."""
    C = problem.cameras.shape[0]
    P = problem.points.shape[0]
    if cam_free is None:
        cam_free = jnp.ones(C, bool)
    if fix_first_cam:
        cam_free = cam_free.at[0].set(False)
    if pt_free is None:
        pt_free = jnp.ones(P, bool)
    # points with no valid observation must not move
    obs_w = problem.obs_ok.astype(jnp.float32)
    pt_nobs = jax.ops.segment_sum(obs_w, problem.obs_pt, num_segments=P)
    pt_free = pt_free & (pt_nobs > 0)

    oc, op, uv, ok = problem.obs_cam, problem.obs_pt, problem.obs_uv, problem.obs_ok
    intr = problem.intr

    def total_cost(cams, pts):
        return sparse_cost(cams, pts, intr, oc, op, uv, ok)

    def lm_step(carry, _):
        cams, pts, lam = carry
        r, Jc, Jp = _obs_residual_jac(cams, pts, intr, oc, op, uv, ok)
        dcam, dpt = _solve_sparse_pcg(r, Jc, Jp, oc, op, lam, cam_free,
                                      pt_free, C, P, n_cg)
        new_cams = cams + dcam
        new_pts = pts + dpt
        c_old = total_cost(cams, pts)
        c_new = total_cost(new_cams, new_pts)
        accept = c_new < c_old
        cams = jnp.where(accept, new_cams, cams)
        pts = jnp.where(accept, new_pts, pts)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return (cams, pts, lam), None

    c0 = total_cost(problem.cameras, problem.points)
    (cams, pts, _), _ = jax.lax.scan(
        lm_step, (problem.cameras, problem.points, jnp.asarray(lam0)),
        None, length=n_iters)
    c1 = total_cost(cams, pts)
    return SparseBAResult(cams, pts, c0, c1)


def make_sparse_problem(Rs, ts, points3d, intr, obs_cam, obs_pt, obs_uv,
                        obs_ok) -> SparseBAProblem:
    """Pack (R, t) pose arrays into the angle-axis flat-obs layout."""
    rvecs = se3.log_so3(jnp.asarray(Rs))
    cams = jnp.concatenate([rvecs, jnp.asarray(ts)], axis=-1)
    return SparseBAProblem(
        cams, jnp.asarray(points3d), jnp.asarray(intr),
        jnp.asarray(obs_cam, jnp.int32), jnp.asarray(obs_pt, jnp.int32),
        jnp.asarray(obs_uv), jnp.asarray(obs_ok),
    )
