"""Camera resection (PnP): pose from 2D-3D correspondences.

Parity: libmv EuclideanResect (sfm/src/libmv/simple_pipeline/resect.cc:94-109)
which runs EPnP then refines with Levenberg-Marquardt. Here: a DLT pose
solver (masked, batched) + a fixed-iteration Gauss-Newton/LM refinement on
SE(3) — same accuracy contract, fully jittable (static trip counts).

Works in normalized (calibrated) coordinates: callers convert pixels via
core.camera.normalize_points first, exactly like the reference inverts
intrinsics before the solver (libmv_capi.h:284 normalized tracks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3


def pnp_dlt(X: jnp.ndarray, xn: jnp.ndarray, mask: jnp.ndarray | None = None):
    """DLT resection: world points X (N, 3), normalized image points xn (N, 2),
    mask (N,). Returns (R, t) world->cam with the camera looking at +z.

    Needs N >= 6 valid points.
    """
    if mask is None:
        mask = jnp.ones(X.shape[0], bool)
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)  # (N,4)
    zero = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    r1 = jnp.concatenate([Xh, zero, -u * Xh], axis=-1)  # (N, 12)
    r2 = jnp.concatenate([zero, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0) * jnp.concatenate([mask, mask])[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    p = Vt[-1]
    P = p.reshape(3, 4)
    # fix sign: majority of valid points must have positive depth
    depths = jnp.einsum("j,nj->n", P[2], Xh)
    sign = jnp.sign(jnp.sum(jnp.where(mask, jnp.sign(depths), 0.0)))
    sign = jnp.where(sign == 0, 1.0, sign)
    P = P * sign
    # scale so that rotation part has unit determinant-ish: use svd projection
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    scale = jnp.mean(S)
    R = se3.project_to_so3(M)
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return R, t


def reprojection_residuals(R, t, X, xn, mask):
    Xc = se3.rotate_points(R, X) + t
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
    pred = Xc[..., :2] / z[..., None]
    r = (pred - xn) * mask[..., None]
    return r


def refine_pose(R, t, X, xn, mask=None, iters: int = 10, damping: float = 1e-6):
    """Levenberg-style Gauss-Newton refinement of (R, t) minimizing
    calibrated reprojection error. Static iteration count; each step builds
    the 6x6 normal equations from vmapped analytic Jacobians.

    Parity: the LM refine step in resect.cc:154-157.
    """
    if mask is None:
        mask = jnp.ones(X.shape[0], bool)

    def step(carry, _):
        R, t = carry
        Xc = se3.rotate_points(R, X) + t
        z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
        pred = Xc[..., :2] / z[..., None]
        r = (pred - xn) * mask[..., None]  # (N, 2)

        # d(pred)/d(Xc): (N, 2, 3)
        x, y = Xc[..., 0], Xc[..., 1]
        invz = 1.0 / z
        J_proj = jnp.stack(
            [
                jnp.stack([invz, jnp.zeros_like(z), -x * invz * invz], axis=-1),
                jnp.stack([jnp.zeros_like(z), invz, -y * invz * invz], axis=-1),
            ],
            axis=-2,
        )
        # d(Xc)/d(xi) with xi = (w, v) left-multiplied increment:
        # dXc = -[Xc]_x dw + dv -> (N, 3, 6)
        J_point = jnp.concatenate(
            [-se3.hat(Xc), jnp.broadcast_to(jnp.eye(3), Xc.shape[:-1] + (3, 3))],
            axis=-1,
        )
        J = jnp.einsum("nij,njk->nik", J_proj, J_point) * mask[..., None, None]
        JtJ = jnp.einsum("nik,nil->kl", J, J)
        Jtr = jnp.einsum("nik,ni->k", J, r)
        H = JtJ + damping * jnp.eye(6)
        dx = -jnp.linalg.solve(H, Jtr)
        dR = se3.exp_so3(dx[:3])
        R_new = dR @ R
        t_new = dR @ t + dx[3:]
        return (R_new, t_new), jnp.sum(r * r)

    (R, t), costs = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t, costs[-1]


def resect(X, xn, mask=None, refine_iters: int = 10):
    """Full resection: DLT init + GN refine (the EuclideanResect contract)."""
    R0, t0 = pnp_dlt(X, xn, mask)
    return refine_pose(R0, t0, X, xn, mask, iters=refine_iters)
