"""Frame-to-frame RGB-D odometry: photometric (RGBD), geometric (ICP), and
joint (RGBD+ICP) Gauss-Newton.

Parity: rgbd/src/odometry.cpp — RGBDICPOdometryImpl (:790, level loop
:851-901): per pyramid level, computeCorresps (:438 projective association
with depth-difference gate), calcRgbdLsmMatrices (:618 photometric
Jacobians), calcICPLsmMatrices (:691 point-to-plane), solveSystem (:764,
det-threshold gate), pose update, and final max-rotation/translation sanity
gates (testDeltaTransformation).

TPU-first: each level iteration is one fused program — warp all pixels,
gather, residuals + analytic Jacobians, masked einsum to the 6x6 system.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import pyramid, se3
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import sample_bilinear, _gather2d
from opencv_contrib_tpu.rgbd import frame as frame_mod
from opencv_contrib_tpu.rgbd.frame import DepthFrame


def _photometric_system(T, gray_src, src: DepthFrame, gray_dst, gdx, gdy, dst: DepthFrame, intr, depth_gate=0.07):
    """Photometric GN system: warp source points into dst, compare
    intensities, Jacobian via image gradients (calcRgbdLsmMatrices)."""
    R, t = se3.mat_to_rt(T)
    p = jnp.einsum("ij,hwj->hwi", R, src.points) + t
    z = jnp.maximum(p[..., 2], 1e-9)
    u = p[..., 0] / z * intr[0] + intr[2]
    v = p[..., 1] / z * intr[1] + intr[3]
    H, W = gray_dst.shape
    inb = (u >= 1) & (u < W - 2) & (v >= 1) & (v < H - 2) & (p[..., 2] > 0) & src.valid

    i_dst = sample_bilinear(gray_dst, v, u)
    gx = sample_bilinear(gdx, v, u)
    gy = sample_bilinear(gdy, v, u)
    d_dst = sample_bilinear(dst.depth, v, u)
    depth_ok = jnp.abs(d_dst - p[..., 2]) < depth_gate
    w = (inb & depth_ok & (d_dst > 0)).astype(jnp.float32)

    r = i_dst - gray_src
    # dI/dxi = [gx gy] * dproj/dp * dp/dxi
    fx, fy = intr[0], intr[1]
    invz = 1.0 / z
    x, y = p[..., 0], p[..., 1]
    # image-gradient chain (2x3 proj jacobian)
    Jx = gx * fx * invz
    Jy = gy * fy * invz
    Jz = -(gx * fx * x + gy * fy * y) * invz * invz
    Jp = jnp.stack([Jx, Jy, Jz], axis=-1)  # dI/dp (H, W, 3)
    Jw = jnp.cross(p, Jp)  # chain through dp/domega = -[p]x -> J_omega = p x Jp
    J = jnp.concatenate([Jw, Jp], axis=-1)
    Jm = J * w[..., None]
    A = jnp.einsum("hwi,hwj->ij", Jm, J)
    b = -jnp.einsum("hwi,hw->i", Jm, r * w)
    return A, b, jnp.sum(w), jnp.sum(w * r * r)


def _icp_system(T, src: DepthFrame, dst: DepthFrame, intr, dist_gate=0.1):
    from opencv_contrib_tpu.rgbd.icp import build_system

    return build_system(T, src, dst, intr, dist_thresh=dist_gate)


@partial(jax.jit, static_argnames=("iters", "method"))
def _solve_level(T0, gray_src, src, gray_dst, dst, intr, iters: int, method: str, w_rgbd: float = 0.1):
    gdy, gdx = filters.gradients(gray_dst)

    def body(T, _):
        A = jnp.zeros((6, 6))
        b = jnp.zeros(6)
        if method in ("rgbd", "merged"):
            Ai, bi, n1, e1 = _photometric_system(T, gray_src, src, gray_dst, gdx, gdy, dst, intr)
            scale = w_rgbd if method == "merged" else 1.0
            A = A + scale * Ai
            b = b + scale * bi
        if method in ("icp", "merged"):
            Ai, bi, n2, e2 = _icp_system(T, src, dst, intr)
            A = A + Ai
            b = b + bi
        # det gate (solveSystem, odometry.cpp:764)
        ok = jnp.linalg.det(A) > 1e-12
        dx = jnp.where(ok, jnp.linalg.solve(A + 1e-9 * jnp.eye(6), b), jnp.zeros(6))
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros(6))
        return se3.exp_se3(dx) @ T, None

    T, _ = jax.lax.scan(body, T0, None, length=iters)
    return T


def compute(
    gray_src,
    depth_src,
    gray_dst,
    depth_dst,
    intr,
    method: str = "merged",
    levels: int = 3,
    iterations: tuple = (7, 7, 10),
    max_rotation: float = 0.5,
    max_translation: float = 0.5,
):
    """Estimate T: src camera -> dst camera (Odometry::compute contract,
    odometry.cpp:1042). method in {'rgbd', 'icp', 'merged'}.

    Returns (T (4,4), success bool)."""
    intr = jnp.asarray(intr)
    src_pyr = frame_mod.make_frame(jnp.asarray(depth_src), intr, levels=levels, use_bilateral=False)
    dst_pyr = frame_mod.make_frame(jnp.asarray(depth_dst), intr, levels=levels, use_bilateral=False)
    gs = pyramid.build_pyramid(jnp.asarray(gray_src), levels)
    gd = pyramid.build_pyramid(jnp.asarray(gray_dst), levels)

    T = jnp.eye(4)
    for l in reversed(range(levels)):
        it = frame_mod.level_intrinsics(intr, l)
        T = _solve_level(
            T, gs[l], src_pyr[l], gd[l], dst_pyr[l], it,
            iters=iterations[min(l, len(iterations) - 1)], method=method,
        )
    # sanity gates (testDeltaTransformation)
    xi = se3.log_se3(T)
    ok = (jnp.linalg.norm(xi[:3]) < max_rotation) & (jnp.linalg.norm(xi[3:]) < max_translation)
    return T, bool(ok)
