"""Mei unified-sphere omnidirectional camera model.

Projection (omnidir::projectPoints semantics): world point -> unit sphere ->
perspective from a center shifted by xi along z -> radial-tangential
distortion -> pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.ops.image import sample_bilinear, grid_coords


def project_points_omni(X, R, t, K, xi: float, dist=None):
    """X (..., 3) world -> pixels (..., 2). K (3,3); dist = (k1, k2, p1, p2)."""
    Xc = se3.rotate_points(R, X) + t
    s = Xc / jnp.maximum(jnp.linalg.norm(Xc, axis=-1, keepdims=True), 1e-9)
    denom = s[..., 2] + xi
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    xu = s[..., 0] / denom
    yu = s[..., 1] / denom
    if dist is not None:
        k1, k2, p1, p2 = dist
        r2 = xu * xu + yu * yu
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = xu * radial + 2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu)
        yd = yu * radial + p1 * (r2 + 2 * yu * yu) + 2 * p2 * xu * yu
        xu, yu = xd, yd
    u = K[0, 0] * xu + K[0, 2]
    v = K[1, 1] * yu + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def undistort_points_omni(px, K, xi: float, dist=None, iters: int = 20):
    """Pixels -> unit-sphere ray directions (..., 3) (cam frame)."""
    xd = (px[..., 0] - K[0, 2]) / K[0, 0]
    yd = (px[..., 1] - K[1, 2]) / K[1, 1]
    xu, yu = xd, yd
    if dist is not None:
        k1, k2, p1, p2 = dist

        def body(_, xy):
            x, y = xy
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2
            dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
            dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
            return ((xd - dx) / radial, (yd - dy) / radial)

        xu, yu = jax.lax.fori_loop(0, iters, body, (xu, yu))
    # invert the sphere projection: find unit s with s_xy/(s_z + xi) = (xu, yu)
    r2 = xu * xu + yu * yu
    disc = jnp.sqrt(jnp.maximum(1.0 + (1.0 - xi * xi) * r2, 0.0))
    factor = (xi + disc) / (1.0 + r2)
    sz = factor - xi
    s = jnp.stack([factor * xu, factor * yu, sz], axis=-1)
    return s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-9)


def undistort_image_omni(img, K, xi: float, K_new=None, dist=None, out_shape=None):
    """Render a perspective view from an omni image
    (omnidir::undistortImage RECTIFY_PERSPECTIVE)."""
    H, W = img.shape[:2] if out_shape is None else out_shape
    if K_new is None:
        K_new = K
    y, x = grid_coords(H, W)
    # perspective ray for each output pixel
    xr = (x - K_new[0, 2]) / K_new[0, 0]
    yr = (y - K_new[1, 2]) / K_new[1, 1]
    rays = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    px = project_points_omni(rays, jnp.eye(3), jnp.zeros(3), K, xi, dist)
    return sample_bilinear(img, px[..., 1], px[..., 0])


def calibrate_xi(obj_pts, img_pts, K, R, t, xi0: float = 0.8, iters: int = 30):
    """Refine the mirror parameter xi given known pose/intrinsics
    (the inner loop of omnidir::calibrate; full joint calibration composes
    this with mvg.resection/ba)."""
    obj_pts = jnp.asarray(obj_pts, jnp.float32)
    img_pts = jnp.asarray(img_pts, jnp.float32)

    def residual(xi):
        pred = project_points_omni(obj_pts, R, t, K, xi)
        return jnp.sum((pred - img_pts) ** 2)

    g = jax.grad(residual)
    h = jax.grad(lambda v: g(v))

    def body(_, xi):
        gg = g(xi)
        hh = h(xi)
        step = gg / jnp.where(jnp.abs(hh) > 1e-9, hh, 1e-9)
        return xi - jnp.clip(step, -0.2, 0.2)

    return jax.lax.fori_loop(0, iters, body, jnp.asarray(xi0))


def calibrate_omni(obj_pts_list, img_pts_list, image_size, K0=None, xi0: float = 0.8,
                   outer_iters: int = 30, pose_iters: int = 8, fix_xi: bool = False):
    """Full joint omnidirectional calibration (omnidir::calibrate,
    ccalib/include/opencv2/ccalib/omnidir.hpp:176): ONE joint
    Levenberg-Marquardt over all per-view poses plus (fx, fy, cx, cy, xi)
    — at ~6V+5 parameters the full dense system is tiny, so the
    reference's alternating schedule is unnecessary on TPU.

    obj_pts_list: list of (N_v, 3) board points; img_pts_list: matching
    (N_v, 2) pixels. Returns (K, xi, Rs, ts, rms_px).

    Identifiability note (shared with the reference): with planar boards of
    moderate FOV, (f, xi) trade off to noise level — the fit is excellent
    but the split is weakly determined. Pass fix_xi=True when the mirror
    parameter is known (then K is well determined).
    """
    import numpy as np

    from opencv_contrib_tpu.core import se3 as s3
    from opencv_contrib_tpu.mvg import resection as rmod

    H, W = image_size
    V = len(obj_pts_list)
    objs = [jnp.asarray(o, jnp.float32) for o in obj_pts_list]
    imgs = [jnp.asarray(i, jnp.float32) for i in img_pts_list]
    xi = jnp.asarray(xi0, jnp.float32)
    n_pose = 6 * V

    def init_theta(K):
        # init poses: undistort pixels with (K, xi0) to pinhole normalized
        # coords, then PnP resection per view
        poses = []
        for o, ip in zip(objs, imgs):
            ray = undistort_points_omni(ip, K, float(xi))
            xn = ray[:, :2] / jnp.maximum(ray[:, 2:3], 1e-6)
            R0, t0, _ = rmod.resect(o, xn)
            poses.append(jnp.concatenate([s3.log_so3(R0), t0]))
        return jnp.concatenate(
            [jnp.concatenate(poses), jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2], xi])])

    if K0 is not None:
        theta0s = [init_theta(jnp.asarray(K0, jnp.float32))]
    else:
        # focal-candidate search (the reference initializes f from board
        # geometry; a small grid is robust across FOVs)
        theta0s = []
        for fs in (0.5, 0.8, 1.2, 1.8):
            f0 = fs * max(H, W)
            Kc = jnp.asarray([[f0, 0, W / 2], [0, f0, H / 2], [0, 0, 1]], jnp.float32)
            theta0s.append(init_theta(Kc))

    def residual(theta):
        Kt = jnp.asarray([[theta[n_pose], 0, theta[n_pose + 2]],
                          [0, theta[n_pose + 1], theta[n_pose + 3]],
                          [0, 0, 1.0]])
        xit = theta[n_pose + 4]
        rs = []
        for v, (o, ip) in enumerate(zip(objs, imgs)):
            pv = theta[6 * v : 6 * v + 6]
            R = s3.exp_so3(pv[:3])
            rs.append((project_points_omni(o, R, pv[3:], Kt, xit) - ip).reshape(-1))
        return jnp.concatenate(rs)

    @jax.jit
    def lm(theta0):
        def step(carry, _):
            theta, lam = carry
            r = residual(theta)
            J = jax.jacfwd(residual)(theta)
            if fix_xi:
                J = J.at[:, n_pose + 4].set(0.0)
            JtJ = J.T @ J
            D = jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-6))
            dd = jnp.linalg.solve(JtJ + lam * D, J.T @ r)
            cand = theta - dd
            # box constraints: xi in [0, 1.2] (unified sphere range), focal
            # and principal point within sane image-scaled bounds — keeps
            # LM off the degenerate large-xi branch of the ambiguity family
            fmax = 4.0 * max(H, W)
            cand = cand.at[n_pose].set(jnp.clip(cand[n_pose], 0.1 * max(H, W), fmax))
            cand = cand.at[n_pose + 1].set(jnp.clip(cand[n_pose + 1], 0.1 * max(H, W), fmax))
            cand = cand.at[n_pose + 2].set(jnp.clip(cand[n_pose + 2], 0.0, W))
            cand = cand.at[n_pose + 3].set(jnp.clip(cand[n_pose + 3], 0.0, H))
            cand = cand.at[n_pose + 4].set(jnp.clip(cand[n_pose + 4], 0.0, 1.2))
            c_old = jnp.sum(r * r)
            c_new = jnp.sum(residual(cand) ** 2)
            ok = c_new < c_old
            theta = jnp.where(ok, cand, theta)
            lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 4.0, 1e6))
            return (theta, lam), None

        (theta, _), _ = jax.lax.scan(step, (theta0, jnp.float32(1e-3)), None, length=outer_iters)
        return theta

    best = None
    for th0 in theta0s:
        th = lm(th0)
        c = float(jnp.sum(residual(th) ** 2))
        if best is None or c < best[0]:
            best = (c, th)
    theta = best[1]
    Kf = np.array([[float(theta[n_pose]), 0, float(theta[n_pose + 2])],
                   [0, float(theta[n_pose + 1]), float(theta[n_pose + 3])],
                   [0, 0, 1.0]], np.float32)
    xif = float(theta[n_pose + 4])
    Rs = [np.asarray(s3.exp_so3(theta[6 * v : 6 * v + 3])) for v in range(V)]
    ts = [np.asarray(theta[6 * v + 3 : 6 * v + 6]) for v in range(V)]
    r = residual(theta)
    rms = float(jnp.sqrt(jnp.mean(r * r)))
    return Kf, xif, Rs, ts, rms
