"""DIS-class dense optical flow: coarse-to-fine patch inverse search +
patch-flow densification + variational refinement.

Structure parity (the BASELINE "DIS-class dense flow" config): DIS
(Kroeger et al., in main opencv video/DISOpticalFlow) = per level:
  (1) grid of overlapping patches, each refined by inverse-search LK,
  (2) densification: per-pixel weighted blend of overlapping patch flows,
  (3) variational refinement (Brox-style) — the same engine
      cv::VariationalRefinement that DeepFlow delegates to
      (optflow/src/deepflow.cpp:155-159).

TPU-first: the patch grid IS the LK point set (one batched lk_level call);
densification is expressed with box filters over weighted flow maps (no
scatter); variational refinement is a fixed-iteration Jacobi sweep of the
linearized brightness-constancy + smoothness system.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import pyramid
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import sample_bilinear, sample_bilinear_multi, grid_coords
from opencv_contrib_tpu.flow import lk


def _patch_grid(H: int, W: int, stride: int):
    ys = jnp.arange(stride // 2, H - stride // 2, stride, dtype=jnp.float32)
    xs = jnp.arange(stride // 2, W - stride // 2, stride, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gy.reshape(-1), gx.reshape(-1)], axis=1)


@partial(jax.jit, static_argnames=("stride", "radius", "iters"))
def _level_patch_flow(I0, I1, flow_init, stride: int, radius: int, iters: int):
    """Inverse-search patch refinement + densification on one level.

    flow_init: (H, W, 2) upscaled flow from the coarser level.
    Returns dense (H, W, 2).
    """
    H, W = I0.shape
    pts = _patch_grid(H, W, stride)  # (P, 2)
    f0 = sample_bilinear(flow_init, pts[:, 0], pts[:, 1])  # (P, 2)
    flow_p, valid = lk.lk_level(I0, I1, pts, f0, radius=radius, iters=iters)
    # patch residual -> weight (DIS uses inverse mean abs diff)
    from opencv_contrib_tpu.ops.image import sample_windows
    T = sample_windows(I0, pts, radius)
    Iw = sample_windows(I1, pts, radius, flow_yx=flow_p)
    res = jnp.mean(jnp.abs(Iw - T), axis=1)
    w = jnp.where(valid, 1.0 / (res + 1e-2), 1e-6)
    flow_p = jnp.where(valid[:, None], flow_p, f0)

    # densification: splat each patch's flow into its stride cell, then
    # box-blur over the patch footprint => weighted average of overlapping
    # patches (scatter-free: nearest-cell assignment + smoothing)
    Hp = len(jnp.arange(stride // 2, H - stride // 2, stride))
    Wp = len(jnp.arange(stride // 2, W - stride // 2, stride))
    fmap = flow_p.reshape(Hp, Wp, 2)
    wmap = w.reshape(Hp, Wp, 1)
    # upsample to full res by nearest + blur
    fy = jnp.clip((jnp.arange(H) - stride // 2) // stride, 0, Hp - 1)
    fx = jnp.clip((jnp.arange(W) - stride // 2) // stride, 0, Wp - 1)
    dense_f = fmap[fy][:, fx]  # (H, W, 2)
    dense_w = wmap[fy][:, fx]
    num = filters.box_filter(dense_f * dense_w, radius)
    den = filters.box_filter(dense_w, radius)
    return num / jnp.maximum(den, 1e-9)


@partial(jax.jit, static_argnames=("iters", "outer"))
def variational_refine(I0, I1, flow, alpha: float = 8.0, outer: int = 3, iters: int = 30):
    """Brox-style variational refinement (cv::VariationalRefinement contract):
    linearize brightness constancy at the current flow, solve the
    diffusion-regularized system with fixed Jacobi sweeps."""
    gy1, gx1 = filters.gradients(I1)

    maps = jnp.stack([I1, gx1, gy1])  # one corner-stacked gather for all 3

    def outer_body(flow, _):
        y, x = grid_coords(*I0.shape)
        wy = y + flow[..., 0]
        wx = x + flow[..., 1]
        Iw, Ix, Iy = sample_bilinear_multi(maps, wy, wx)
        It = Iw - I0

        # robust data weight (Charbonnier)
        def jacobi(flow_d, _):
            du = flow_d[..., 0] - flow[..., 0]
            dv = flow_d[..., 1] - flow[..., 1]
            r = It + Iy * du + Ix * dv
            psi = 1.0 / jnp.sqrt(r * r + 1e-4)
            # neighbor average (4-neighborhood)
            nb = (
                jnp.roll(flow_d, 1, 0) + jnp.roll(flow_d, -1, 0)
                + jnp.roll(flow_d, 1, 1) + jnp.roll(flow_d, -1, 1)
            ) / 4.0
            A11 = psi * Iy * Iy + alpha
            A22 = psi * Ix * Ix + alpha
            A12 = psi * Iy * Ix
            b1 = alpha * nb[..., 0] - psi * Iy * (It - Iy * flow[..., 0] - Ix * flow[..., 1])
            b2 = alpha * nb[..., 1] - psi * Ix * (It - Iy * flow[..., 0] - Ix * flow[..., 1])
            det = A11 * A22 - A12 * A12
            u = (A22 * b1 - A12 * b2) / det
            v = (A11 * b2 - A12 * b1) / det
            return jnp.stack([u, v], axis=-1), None

        flow_new, _ = jax.lax.scan(jacobi, flow, None, length=iters)
        return flow_new, None

    flow, _ = jax.lax.scan(outer_body, flow, None, length=outer)
    return flow


def compute(
    I0,
    I1,
    levels: int = 4,
    stride: int = 8,
    radius: int = 8,
    iters: int = 12,
    use_variational: bool = True,
):
    """DIS-class dense flow I0 -> I1. Returns (H, W, 2) as (dy, dx)."""
    I0 = jnp.asarray(I0, jnp.float32)
    I1 = jnp.asarray(I1, jnp.float32)
    p0 = pyramid.build_pyramid(I0, levels)
    p1 = pyramid.build_pyramid(I1, levels)
    Hc, Wc = p0[-1].shape
    flow = jnp.zeros((Hc, Wc, 2))
    for l in reversed(range(levels)):
        if flow.shape[:2] != p0[l].shape:
            from opencv_contrib_tpu.ops.image import resize

            flow = resize(flow, p0[l].shape) * 2.0
        Hl, Wl = p0[l].shape
        # keep at least one patch center per axis on tiny coarse levels
        stride_l = max(2, min(stride, min(Hl, Wl) // 2))
        radius_l = min(radius, stride_l)
        flow = _level_patch_flow(p0[l], p1[l], flow, stride=stride_l, radius=radius_l, iters=iters)
        if use_variational:
            flow = variational_refine(p0[l], p1[l], flow)
    return flow


def epe(flow, flow_gt, mask=None):
    """End-point error metric (the Sintel benchmark metric)."""
    e = jnp.linalg.norm(flow - flow_gt, axis=-1)
    if mask is not None:
        return jnp.sum(e * mask) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(e)
