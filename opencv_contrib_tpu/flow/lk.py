"""Pyramidal Lucas-Kanade optical flow — sparse (keypoints) and dense.

Parity: cv::calcOpticalFlowPyrLK / cuda PyrLK (cudaoptflow/src/cuda/pyrlk.cu)
and the RLOF local-flow family (optflow/src/rlof/*_invoker.hpp) at the
"local window GN" level (illumination model omitted; RLOF's dense grid-seed +
interpolation structure is what flow.dis implements).

TPU-first: all windows are gathered at once; the per-point 2x2 solve is
closed form; iterations are a lax.scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import pyramid
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import sample_bilinear, sample_windows


def _window_offsets(radius: int):
    o = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(o, o, indexing="ij")
    return dy.reshape(-1), dx.reshape(-1)


@partial(jax.jit, static_argnames=("radius", "iters"))
def lk_level(I0, I1, pts_yx, flow0, radius: int = 7, iters: int = 10):
    """One-level LK: track points pts_yx (N, 2) from I0 to I1 starting at
    flow0 (N, 2) (dy, dx). Returns (flow (N, 2), valid (N,))."""
    gy, gx = filters.gradients(I0)
    # fixed-fraction window sampling: row gathers + MXU x-selection
    # (ops.image.sample_windows) — the generic per-point gather path cost
    # 764 ms/frame in DIS at VGA
    T = sample_windows(I0, pts_yx, radius)  # template (N, M)
    Gy = sample_windows(gy, pts_yx, radius)
    Gx = sample_windows(gx, pts_yx, radius)
    # 2x2 structure tensor per point (template gradients, inverse-compositional)
    A11 = jnp.sum(Gy * Gy, axis=1)
    A12 = jnp.sum(Gy * Gx, axis=1)
    A22 = jnp.sum(Gx * Gx, axis=1)
    det = A11 * A22 - A12 * A12
    ok = det > 1e-6
    det = jnp.where(ok, det, 1.0)

    def body(flow, _):
        Iw = sample_windows(I1, pts_yx, radius, flow_yx=flow)
        r = Iw - T
        b1 = jnp.sum(Gy * r, axis=1)
        b2 = jnp.sum(Gx * r, axis=1)
        ddy = (A22 * b1 - A12 * b2) / det
        ddx = (A11 * b2 - A12 * b1) / det
        step = jnp.stack([ddy, ddx], axis=1)
        step = jnp.where(ok[:, None], step, 0.0)
        return flow - step, None

    flow, _ = jax.lax.scan(body, flow0, None, length=iters)
    H, W = I0.shape
    tgt_y = pts_yx[:, 0] + flow[:, 0]
    tgt_x = pts_yx[:, 1] + flow[:, 1]
    inb = (tgt_y >= 0) & (tgt_y <= H - 1) & (tgt_x >= 0) & (tgt_x <= W - 1)
    return flow, ok & inb


def track(I0, I1, pts_yx, levels: int = 3, radius: int = 7, iters: int = 10):
    """Pyramidal sparse LK: returns (new_pts (N,2), flow (N,2), valid)."""
    p0 = pyramid.build_pyramid(I0, levels)
    p1 = pyramid.build_pyramid(I1, levels)
    N = pts_yx.shape[0]
    flow = jnp.zeros((N, 2))
    valid = jnp.ones(N, bool)
    for l in reversed(range(levels)):
        scale = 0.5**l
        flow, v = lk_level(p0[l], p1[l], pts_yx * scale, flow, radius=radius, iters=iters)
        valid = valid & v
        if l > 0:
            flow = flow * 2.0
    return pts_yx + flow, flow, valid
