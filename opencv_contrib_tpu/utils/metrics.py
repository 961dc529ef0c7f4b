"""Evaluation metrics.

- Trajectory: ATE / RPE (the TUM RGB-D benchmark metrics — the reference's
  KinFu is judged on these; BASELINE.md "TUM fr1 ATE").
- Image quality: PSNR / SSIM / GMSD (parity: quality module —
  QualityPSNR/SSIM/GMSD, quality/README.md:9-22).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


# ----------------------------------------------------------------------------
# Trajectory metrics
# ----------------------------------------------------------------------------


def umeyama_align(A: np.ndarray, B: np.ndarray, with_scale: bool = True):
    """Similarity transform (s, R, t) minimizing |s R A + t - B|^2."""
    muA, muB = A.mean(0), B.mean(0)
    Ac, Bc = A - muA, B - muB
    C = Bc.T @ Ac / len(A)
    U, S, Vt = np.linalg.svd(C)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    if with_scale:
        var = (Ac**2).sum() / len(A)
        s = float(np.trace(np.diag(S) @ D) / var)
    else:
        s = 1.0
    t = muB - s * R @ muA
    return s, R, t


def ate_rmse(traj_est: np.ndarray, traj_gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE of aligned positions).
    traj_* are (N, 3) camera centers or (N, 4, 4) poses."""
    if traj_est.ndim == 3:
        traj_est = traj_est[:, :3, 3]
    if traj_gt.ndim == 3:
        traj_gt = traj_gt[:, :3, 3]
    if align:
        s, R, t = umeyama_align(traj_est, traj_gt)
        traj_est = (s * (R @ traj_est.T)).T + t
    return float(np.sqrt(((traj_est - traj_gt) ** 2).sum(axis=1).mean()))


def rpe(traj_est: np.ndarray, traj_gt: np.ndarray, delta: int = 1):
    """Relative pose error over frame gaps of `delta`: returns
    (trans_rmse, rot_rmse_rad). traj_* are (N, 4, 4)."""
    t_errs, r_errs = [], []
    for i in range(len(traj_est) - delta):
        dE = np.linalg.inv(traj_est[i]) @ traj_est[i + delta]
        dG = np.linalg.inv(traj_gt[i]) @ traj_gt[i + delta]
        E = np.linalg.inv(dG) @ dE
        t_errs.append(np.linalg.norm(E[:3, 3]))
        r_errs.append(np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)))
    return float(np.sqrt(np.mean(np.square(t_errs)))), float(np.sqrt(np.mean(np.square(r_errs))))


# ----------------------------------------------------------------------------
# Image quality (quality-module parity)
# ----------------------------------------------------------------------------


def mse(a, b) -> float:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.mean((a - b) ** 2))


def psnr(a, b, max_val: float = 1.0) -> float:
    """QualityPSNR parity."""
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val * max_val / m))


def ssim(a, b, max_val: float = 1.0, sigma: float = 1.5):
    """QualitySSIM parity (Gaussian-windowed, standard constants)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    mu_a = filters.gaussian_blur(a, sigma)
    mu_b = filters.gaussian_blur(b, sigma)
    va = filters.gaussian_blur(a * a, sigma) - mu_a * mu_a
    vb = filters.gaussian_blur(b * b, sigma) - mu_b * mu_b
    cov = filters.gaussian_blur(a * b, sigma) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + C1) * (2 * cov + C2)) / (
        (mu_a * mu_a + mu_b * mu_b + C1) * (va + vb + C2)
    )
    return jnp.mean(s)


def gmsd(a, b, c: float = 0.0026):
    """QualityGMSD parity: gradient-magnitude-similarity deviation."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    # Prewitt gradients on 2x-downsampled images (per the GMSD paper)
    a2 = (a[::2, ::2] + a[1::2, ::2] + a[::2, 1::2] + a[1::2, 1::2]) / 4.0 if a.shape[0] % 2 == 0 and a.shape[1] % 2 == 0 else a
    b2 = (b[::2, ::2] + b[1::2, ::2] + b[::2, 1::2] + b[1::2, 1::2]) / 4.0 if b.shape[0] % 2 == 0 and b.shape[1] % 2 == 0 else b
    k = jnp.array([[1.0, 0.0, -1.0]] * 3) / 3.0
    gax = filters.conv2d(a2, k)
    gay = filters.conv2d(a2, k.T)
    gbx = filters.conv2d(b2, k)
    gby = filters.conv2d(b2, k.T)
    ma = jnp.sqrt(gax * gax + gay * gay)
    mb = jnp.sqrt(gbx * gbx + gby * gby)
    gms = (2 * ma * mb + c) / (ma * ma + mb * mb + c)
    return jnp.std(gms)
