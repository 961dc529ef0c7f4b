"""Schur-complement Levenberg-Marquardt bundle adjustment.

Problem layout (TPU-first, static shapes):
- cameras: angle-axis + translation, packed (C, 6) — same parameterization
  as the reference (bundle.cc:90-160 packs R|t as a 6-vector).
- points: (P, 3).
- intrinsics: shared (9,) vector (core.camera layout); refined optionally
  with the same "bundle what you ask for" contract as
  EuclideanBundleCommonIntrinsics (bundle.cc:461).
- observations: dense grid (C, P, 2) pixels + validity mask (C, P) — the
  tracks-tensor form of libmv::Tracks (tracks.h:45; SURVEY §7).

Solve structure (mirrors Ceres ITERATIVE_SCHUR with explicit Schur
complement, bundle.cc:617-632):
  J = [Jc | Jp];  H = [[U, W], [W', V]];  eliminate points:
  S = U - W V^-1 W';  solve S dc = bc - W V^-1 bp (dense Cholesky);
  dp = V^-1 (bp - W' dc).
All blocks are built with einsums over the observation grid; V^-1 is a
batched 3x3 solve. Gauge: first camera (and optionally intrinsics) held
fixed via parameter masks, like the reference's constant-camera SubsetManifold
(bundle.cc:550-560).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import camera as cam
from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.utils.precision import f32_matmuls


class BAProblem(NamedTuple):
    cameras: jnp.ndarray  # (C, 6) [rvec | tvec]
    points: jnp.ndarray  # (P, 3)
    intr: jnp.ndarray  # (9,)
    obs: jnp.ndarray  # (C, P, 2) pixel observations
    mask: jnp.ndarray  # (C, P) bool


class BAResult(NamedTuple):
    cameras: jnp.ndarray
    points: jnp.ndarray
    intr: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    lam_history: jnp.ndarray


def _project_obs(cam6: jnp.ndarray, X: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Forward model for a single observation: camera (6,), point (3,) -> px (2,).

    Direct transcription of OpenCVReprojectionError's model (bundle.cc:90-160):
    x = R X + t; normalize; distort; to pixels.
    """
    R = se3.exp_so3(cam6[:3])
    Xc = R @ X + cam6[3:]
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    xn = Xc[:2] / z
    return cam.denormalize_points(intr, xn)


def residuals(cameras, points, intr, obs, mask):
    """Masked residual grid (C, P, 2)."""
    f = jax.vmap(jax.vmap(_project_obs, in_axes=(None, 0, None)), in_axes=(0, None, None))
    pred = f(cameras, points, intr)
    return (pred - obs) * mask[..., None]


def cost(cameras, points, intr, obs, mask):
    r = residuals(cameras, points, intr, obs, mask)
    return 0.5 * jnp.sum(r * r)


def rms_reprojection_error(cameras, points, intr, obs, mask):
    """Reference metric: RMS pixel reprojection error over valid observations
    (libmv_capi.h:352-356 / pipeline.cc:266 finishReconstruction)."""
    r = residuals(cameras, points, intr, obs, mask)
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sqrt(jnp.sum(r * r) / n)


def _per_obs_jacobians(cameras, points, intr, obs, mask, optimize_intr: bool):
    """Analytic-via-autodiff per-observation Jacobians.

    Returns r (C,P,2), Jc (C,P,2,6), Jp (C,P,2,3), Ji (C,P,2,9) or None.
    """

    def one(cam6, X):
        return _project_obs(cam6, X, intr)

    def with_intr(cam6, X, it):
        return _project_obs(cam6, X, it)

    grid = jax.vmap(jax.vmap(
        lambda c, X: (one(c, X), jax.jacfwd(one, argnums=(0, 1))(c, X)),
        in_axes=(None, 0)), in_axes=(0, None))
    pred, (Jc, Jp) = grid(cameras, points)
    r = (pred - obs) * mask[..., None]
    m = mask[..., None, None]
    Jc = Jc * m
    Jp = Jp * m
    Ji = None
    if optimize_intr:
        gi = jax.vmap(jax.vmap(
            lambda c, X: jax.jacfwd(with_intr, argnums=2)(c, X, intr),
            in_axes=(None, 0)), in_axes=(0, None))
        Ji = gi(cameras, points) * m
    return r, Jc, Jp, Ji


def _solve_schur(r, Jc, Jp, lam, cam_free, pt_free, Ji=None, intr_sel=None,
                 intr_tie=None):
    """One damped Schur step. cam_free (C,) and pt_free (P,) gate updates
    (gauge fixing / constant blocks). When Ji (C,P,2,9) is given, the shared
    intrinsics enter the reduced system as one extra global block (the packed
    intrinsics block of EuclideanBundleCommonIntrinsics, bundle.cc:461) and
    intr_sel (9,) selects which components are free.

    Returns (dcam (C,6), dpt (P,3), dintr (9,))."""
    C, P = r.shape[0], r.shape[1]
    # Blocks
    U = jnp.einsum("cpki,cpkj->cij", Jc, Jc)  # (C, 6, 6)
    V = jnp.einsum("cpki,cpkj->pij", Jp, Jp)  # (P, 3, 3)
    W = jnp.einsum("cpki,cpkj->cpij", Jc, Jp)  # (C, P, 6, 3)
    bc = -jnp.einsum("cpki,cpk->ci", Jc, r)  # (C, 6)
    bp = -jnp.einsum("cpki,cpk->pi", Jp, r)  # (P, 3)

    # LM damping (multiplicative on the diagonal, Ceres-style)
    dU = jnp.maximum(jnp.diagonal(U, axis1=1, axis2=2), 1e-6)  # (C, 6)
    dV = jnp.maximum(jnp.diagonal(V, axis1=1, axis2=2), 1e-6)  # (P, 3)
    U = U + jax.vmap(jnp.diag)(lam * dU)
    V = V + jax.vmap(jnp.diag)(lam * dV)

    # freeze fixed points by making their V huge (no update leaks)
    Vinv = jnp.linalg.inv(V + (~pt_free)[:, None, None] * jnp.eye(3)[None] * 1e12)
    Y = jnp.einsum("cpij,pjk->cpik", W, Vinv)  # (C, P, 6, 3)

    # Reduced camera system S (C,6,C,6) and rhs
    S = -jnp.einsum("apik,bpjk->aibj", Y, W)
    idx = jnp.arange(C)
    S = S.at[idx, :, idx, :].add(U)
    rhs = bc - jnp.einsum("cpik,pk->ci", Y, bp)

    # freeze fixed cameras: identity rows/cols, zero rhs
    free = cam_free.astype(S.dtype)
    Sm = S * free[:, None, None, None] * free[None, None, :, None]
    Sm = Sm.at[idx, :, idx, :].add((1.0 - free)[:, None, None] * jnp.eye(6)[None])
    rhs = rhs * free[:, None]

    n = C * 6
    if Ji is not None:
        # intrinsics as an extra global block of the reduced system
        sel = intr_sel.astype(r.dtype) if intr_sel is not None else jnp.ones(9, r.dtype)
        if intr_tie is not None:
            # reduced parameterization (e.g. fx/fy tied to one focal):
            # columns of Ji combined by the tie matrix; solve in q-space
            Ji = jnp.einsum("cpka,ab->cpkb", Ji, intr_tie)
        Ji = Ji * sel[None, None, None, :]
        A_ii = jnp.einsum("cpki,cpkj->ij", Ji, Ji)  # (9, 9)
        A_ci = jnp.einsum("cpki,cpkj->cij", Jc, Ji)  # (C, 6, 9)
        Bi = jnp.einsum("cpki,cpkj->pij", Ji, Jp)  # (P, 9, 3)
        b_i = -jnp.einsum("cpki,cpk->i", Ji, r)  # (9,)
        A_ii = A_ii + jnp.diag(lam * jnp.maximum(jnp.diag(A_ii), 1e-6))
        S_ci = A_ci - jnp.einsum("apik,pjk->aij", Y, Bi)  # (C, 6, 9)
        S_ci = S_ci * free[:, None, None]
        BiV = jnp.einsum("pij,pjk->pik", Bi, Vinv)  # (P, 9, 3)
        S_ii = A_ii - jnp.einsum("pik,pjk->ij", BiV, Bi)
        rhs_i = b_i - jnp.einsum("pik,pk->i", BiV, bp)
        # pin frozen intrinsic components
        S_ii = S_ii + jnp.diag(1.0 - sel)
        rhs_i = rhs_i * sel

        full = jnp.zeros((n + 9, n + 9), r.dtype)
        full = full.at[:n, :n].set(Sm.reshape(n, n))
        full = full.at[:n, n:].set(S_ci.reshape(n, 9))
        full = full.at[n:, :n].set(S_ci.reshape(n, 9).T)
        full = full.at[n:, n:].set(S_ii)
        frhs = jnp.concatenate([rhs.reshape(-1), rhs_i])
        sol = jnp.linalg.solve(full + 1e-9 * jnp.eye(n + 9), frhs)
        dcam = sol[:n].reshape(C, 6)
        dq = sol[n:] * sel  # reduced(q)-space intrinsics update
        dpt = jnp.einsum(
            "pij,pj->pi",
            Vinv,
            bp - jnp.einsum("cpij,ci->pj", W, dcam) - jnp.einsum("pij,i->pj", Bi, dq),
        )
        # map back to the full parameter space (broadcast tied components)
        dintr = dq if intr_tie is None else intr_tie @ dq
    else:
        Sd = Sm.reshape(n, n)
        dcam = jnp.linalg.solve(Sd + 1e-9 * jnp.eye(n), rhs.reshape(-1)).reshape(C, 6)
        dintr = jnp.zeros(9, r.dtype)
        dpt = jnp.einsum("pij,pj->pi", Vinv, bp - jnp.einsum("cpij,ci->pj", W, dcam))
    dpt = dpt * pt_free[:, None]
    dcam = dcam * cam_free[:, None]
    return dcam, dpt, dintr


def _solve_schur_pcg(r, Jc, Jp, lam, cam_free, pt_free, n_cg: int = 30):
    """Implicit-Schur preconditioned CG camera solve (Ceres'
    ITERATIVE_SCHUR + SCHUR_JACOBI, bundle.cc:617-623) — the O(C^2 P)
    explicit S = U - W V^-1 W^T formation is replaced by O(C P) matvecs
    S@x = U@x - Y (W^T x), with the block-diagonal of S as preconditioner.
    The scalable path for large camera counts."""
    C, P = r.shape[0], r.shape[1]
    U = jnp.einsum("cpki,cpkj->cij", Jc, Jc)
    V = jnp.einsum("cpki,cpkj->pij", Jp, Jp)
    W = jnp.einsum("cpki,cpkj->cpij", Jc, Jp)
    bc = -jnp.einsum("cpki,cpk->ci", Jc, r)
    bp = -jnp.einsum("cpki,cpk->pi", Jp, r)

    dU = jnp.maximum(jnp.diagonal(U, axis1=1, axis2=2), 1e-6)
    dV = jnp.maximum(jnp.diagonal(V, axis1=1, axis2=2), 1e-6)
    U = U + jax.vmap(jnp.diag)(lam * dU)
    V = V + jax.vmap(jnp.diag)(lam * dV)
    Vinv = jnp.linalg.inv(V + (~pt_free)[:, None, None] * jnp.eye(3)[None] * 1e12)
    Y = jnp.einsum("cpij,pjk->cpik", W, Vinv)  # (C, P, 6, 3)

    free = cam_free.astype(r.dtype)

    def matvec(x):  # x (C, 6)
        x = x * free[:, None]
        wx = jnp.einsum("cpij,ci->pj", W, x)  # (P, 3) sum over cams
        sx = jnp.einsum("cij,cj->ci", U, x) - jnp.einsum("cpik,pk->ci", Y, wx)
        return sx * free[:, None] + x * (1.0 - free)[:, None]

    rhs = (bc - jnp.einsum("cpik,pk->ci", Y, bp)) * free[:, None]
    # SCHUR_JACOBI preconditioner: diagonal blocks of S
    S_diag = U - jnp.einsum("cpik,cpjk->cij", Y, W)
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
    dpt = jnp.einsum("pij,pj->pi", Vinv, bp - jnp.einsum("cpij,ci->pj", W, dcam))
    dpt = dpt * pt_free[:, None]
    return dcam, dpt, jnp.zeros(9, r.dtype)


@f32_matmuls
@partial(jax.jit, static_argnames=("n_iters", "optimize_intr", "fix_first_cam", "solver", "n_cg"))
def bundle_adjust(
    problem: BAProblem,
    n_iters: int = 20,
    optimize_intr: bool = False,
    fix_first_cam: bool = True,
    cam_free: jnp.ndarray | None = None,
    pt_free: jnp.ndarray | None = None,
    lam0: float = 1e-4,
    solver: str = "auto",
    n_cg: int = 30,
) -> BAResult:
    """Levenberg-Marquardt BA with in-graph accept/reject (static trip count).

    Contract parity: EuclideanBundle (bundle.cc:450) with
    BUNDLE_NO_INTRINSICS, or EuclideanBundleCommonIntrinsics when
    optimize_intr=True; first camera locked like bundle.cc:550.
    """
    C, P = problem.obs.shape[0], problem.obs.shape[1]
    if cam_free is None:
        cam_free = jnp.ones(C, bool)
    if fix_first_cam:
        cam_free = cam_free.at[0].set(False)
    if pt_free is None:
        pt_free = jnp.ones(P, bool)
    # points with no valid observation must not move
    pt_free = pt_free & (jnp.sum(problem.mask, axis=0) > 0)

    obs, mask, intr0 = problem.obs, problem.mask, problem.intr

    def total_cost(cams, pts, it):
        return cost(cams, pts, it, obs, mask)

    # which intrinsic components BA may move (f, c, k1, k2 — the common
    # BUNDLE_FOCAL_LENGTH | BUNDLE_PRINCIPAL_POINT | BUNDLE_RADIAL choice).
    # fx/fy are TIED to one shared focal parameter (the reference's
    # BUNDLE_FOCAL_LENGTH is a single f, bundle.cc:80-84): slot 0 carries
    # the shared focal direction, slot 1 is pinned, and the update is
    # broadcast back to both components below.
    intr_sel = jnp.array([1.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    # tie matrix T: param-space perturbation = T @ reduced-space q
    intr_tie = jnp.eye(9).at[1, 0].set(1.0).at[1, 1].set(0.0)

    # Solver choice (measured on v5e, dense obs grid): the explicit Schur
    # formation is MXU-fast and everything is O(C*P) bandwidth-bound in the
    # Jacobian grid, so explicit wins through at least 512 cameras
    # (10.0 vs 8.2 iters/s at 512x8192). PCG avoids materializing the
    # (6C)^2 reduced system, which only matters past ~1k cameras.
    C_ = problem.obs.shape[0]
    if solver == "pcg" and optimize_intr:
        # _solve_schur_pcg has no intrinsics block — a silent zero update
        # every iteration would never optimize intrinsics
        raise ValueError(
            "solver='pcg' does not support optimize_intr=True; "
            "use solver='schur' (or 'auto')")
    use_pcg = (solver == "pcg") or (solver == "auto" and C_ > 1024 and not optimize_intr)

    def lm_step(carry, _):
        cams, pts, it, lam = carry
        r, Jc, Jp, Ji = _per_obs_jacobians(cams, pts, it, obs, mask, optimize_intr)
        if use_pcg:
            dcam, dpt, di = _solve_schur_pcg(r, Jc, Jp, lam, cam_free, pt_free, n_cg=n_cg)
        else:
            dcam, dpt, di = _solve_schur(
                r, Jc, Jp, lam, cam_free, pt_free,
                Ji=Ji if optimize_intr else None,
                intr_sel=intr_sel if optimize_intr else None,
                intr_tie=intr_tie if optimize_intr else None,
            )
        new_cams = cams + dcam
        new_pts = pts + dpt
        new_it = it + di
        c_old = total_cost(cams, pts, it)
        c_new = total_cost(new_cams, new_pts, new_it)
        accept = c_new < c_old
        cams = jnp.where(accept, new_cams, cams)
        pts = jnp.where(accept, new_pts, pts)
        it = jnp.where(accept, new_it, it)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        return (cams, pts, it, lam), lam

    c0 = total_cost(problem.cameras, problem.points, intr0)
    (cams, pts, it, lam), lam_hist = jax.lax.scan(
        lm_step, (problem.cameras, problem.points, intr0, jnp.asarray(lam0)), None, length=n_iters
    )
    c1 = total_cost(cams, pts, it)
    return BAResult(cams, pts, it, c0, c1, lam_hist)


def points_only_adjust(problem: BAProblem, n_iters: int = 5) -> jnp.ndarray:
    """Refine only the 3D points with cameras fixed (the reference's
    points-only BA for zero-weight tracks, bundle.cc:379-446). Batched
    independent 3x3 GN solves."""
    res = bundle_adjust(
        problem,
        n_iters=n_iters,
        cam_free=jnp.zeros(problem.cameras.shape[0], bool),
        fix_first_cam=False,
    )
    return res.points


def make_problem_from_scene(Rs, ts, points3d, intr, obs, mask) -> BAProblem:
    """Pack (R, t) pose arrays into the angle-axis problem layout."""
    rvecs = se3.log_so3(jnp.asarray(Rs))
    cams = jnp.concatenate([rvecs, jnp.asarray(ts)], axis=-1)
    return BAProblem(cams, jnp.asarray(points3d), jnp.asarray(intr), jnp.asarray(obs), jnp.asarray(mask))
