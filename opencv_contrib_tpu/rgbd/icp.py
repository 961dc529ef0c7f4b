"""Fast point-to-plane ICP with projective data association.

Parity: rgbd/src/fast_icp.cpp — ICPImpl::estimateTransformT (:93-130):
coarse-to-fine over the pyramid with fixed per-level iteration counts;
GetAbInvoker (:175) builds the 6x7 normal system [A|b] by projecting source
points into the target frame and gating on distance/normal angle; solve 6x6
(SVD) and compose the incremental rigid update.

TPU-first: getAb is ONE fused computation — transform all source points,
gather target point/normal maps at the projected pixels, compute per-pixel
residual and 6-vector Jacobian rows, masked einsum reduction to (6,6)+(6,)
— the reference's mutex-guarded per-row accumulation becomes a deterministic
tree reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.ops.image import _gather2d
from opencv_contrib_tpu.rgbd.frame import DepthFrame


def build_system(
    T: jnp.ndarray,
    src: DepthFrame,
    dst: DepthFrame,
    intr: jnp.ndarray,
    dist_thresh: float = 0.1,
    angle_thresh: float = 0.52,  # ~30 deg, reference's default cos gate
):
    """The getAb step: (A (6,6), b (6,), n_corr, mean_err) for pose T mapping
    source camera frame -> target camera frame."""
    R, t = se3.mat_to_rt(T)
    p = jnp.einsum("ij,hwj->hwi", R, src.points) + t  # source pts in dst frame
    # projective association
    u = p[..., 0] / jnp.maximum(p[..., 2], 1e-9) * intr[0] + intr[2]
    v = p[..., 1] / jnp.maximum(p[..., 2], 1e-9) * intr[1] + intr[3]
    H, W = dst.depth.shape
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H) & (p[..., 2] > 0) & src.valid

    # one 7-wide row gather (points, normals, valid) instead of three —
    # TPU gathers pay per row (see ops.image.sample_bilinear_multi)
    Tm = jnp.concatenate(
        [dst.points, dst.normals, dst.valid[..., None].astype(dst.points.dtype)], axis=-1
    ).reshape(-1, 7)
    rows = Tm[jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)]
    q = rows[..., 0:3]
    n = rows[..., 3:6]
    qv = rows[..., 6] > 0.5

    diff = p - q
    dist_ok = jnp.sum(diff * diff, axis=-1) < dist_thresh * dist_thresh
    # normal agreement between rotated source normal and target normal
    ns = jnp.einsum("ij,hwj->hwi", R, src.normals)
    cos = jnp.sum(ns * n, axis=-1)
    ang_ok = cos > jnp.cos(angle_thresh)
    w = (inb & qv & dist_ok & ang_ok).astype(jnp.float32)

    r = jnp.sum(n * diff, axis=-1)  # point-to-plane residual
    Jw = jnp.cross(p, n)  # d r / d omega
    J = jnp.concatenate([Jw, n], axis=-1)  # (H, W, 6)

    Jm = J * w[..., None]
    A = jnp.einsum("hwi,hwj->ij", Jm, J)
    b = -jnp.einsum("hwi,hw->i", Jm, r)
    n_corr = jnp.sum(w)
    mean_err = jnp.sum(w * r * r) / jnp.maximum(n_corr, 1.0)
    return A, b, n_corr, mean_err


def _solve6(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Damped 6x6 solve (the reference uses DECOMP_SVD; a Tikhonov-damped
    Cholesky is equivalent at these conditioning levels and cheaper)."""
    return jnp.linalg.solve(A + 1e-6 * jnp.eye(6), b)


@partial(jax.jit, static_argnames=("iters",))
def icp_level(T0, src: DepthFrame, dst: DepthFrame, intr, iters: int = 5, dist_thresh: float = 0.1):
    """Fixed-iteration point-to-plane ICP on one pyramid level."""

    def body(T, _):
        A, b, n_corr, err = build_system(T, src, dst, intr, dist_thresh)
        dx = _solve6(A, b)
        ok = (n_corr > 30) & jnp.all(jnp.isfinite(dx))
        dx = jnp.where(ok, dx, 0.0)
        T_new = se3.exp_se3(dx) @ T
        return T_new, (n_corr, err)

    T, aux = jax.lax.scan(body, T0, None, length=iters)
    return T, aux


def estimate_transform(
    src_pyr: tuple[DepthFrame, ...],
    dst_pyr: tuple[DepthFrame, ...],
    intr: jnp.ndarray,
    iterations: tuple[int, ...] = (10, 5, 4),
    dist_thresh: float = 0.1,
):
    """Multiscale ICP, coarse -> fine (estimateTransformT, fast_icp.cpp:93).

    iterations[l] applies to pyramid level l (0 = finest), executed coarsest
    first like the reference. Returns (T src->dst, success flag, residual).
    """
    from opencv_contrib_tpu.rgbd.frame import level_intrinsics

    levels = len(src_pyr)
    T = jnp.eye(4)
    n_corr = jnp.asarray(0.0)
    err = jnp.asarray(jnp.inf)
    for l in reversed(range(levels)):
        it = level_intrinsics(intr, l)
        T, (ncs, errs) = icp_level(
            T, src_pyr[l], dst_pyr[l], it, iters=iterations[min(l, len(iterations) - 1)],
            dist_thresh=dist_thresh * (1 << l),
        )
        n_corr, err = ncs[-1], errs[-1]
    success = (n_corr > 100) & (err < 0.05)
    return T, success, err
