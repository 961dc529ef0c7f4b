"""Edge/line detection: gradient structured edges, Hough lines, thinning."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters, morphology


def structured_edges_lite(img: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Edge probability map from multi-scale oriented gradients — the
    API/shape contract of StructuredEdgeDetection::detectEdges
    (structured_edge_detection.hpp:97; the reference's learned forest is a
    shipped model, the detector contract is edges in [0,1])."""
    e = jnp.zeros_like(img)
    for s in (sigma, 2 * sigma, 4 * sigma):
        g = filters.gaussian_blur(img, s)
        gy, gx = filters.gradients(g)
        e = e + jnp.sqrt(gy * gy + gx * gx)
    e = e / 3.0
    mx = jnp.max(e)
    e = e / jnp.maximum(mx, 1e-9)
    # thin edges via NMS along the gradient direction (4 quantized dirs)
    gy, gx = filters.gradients(filters.gaussian_blur(img, sigma))
    ang = jnp.arctan2(gy, gx)
    q = jnp.round(ang / (jnp.pi / 4)).astype(jnp.int32) % 4
    shifts = [(0, 1), (1, 1), (1, 0), (1, -1)]
    nms = e
    for k, (dy, dx) in enumerate(shifts):
        n1 = jnp.roll(e, (dy, dx), (0, 1))
        n2 = jnp.roll(e, (-dy, -dx), (0, 1))
        keep = (e >= n1) & (e >= n2)
        nms = jnp.where((q == k) & ~keep, 0.0, nms)
    return nms


@partial(jax.jit, static_argnames=("n_angles", "n_rho"))
def fast_hough_lines(edge_mask: jnp.ndarray, n_angles: int = 180, n_rho: int = 256):
    """Hough transform accumulator (parity: FastHoughTransform /
    FastLineDetector's role): returns (accumulator (n_angles, n_rho),
    thetas, rhos)."""
    H, W = edge_mask.shape
    ys, xs = jnp.nonzero(edge_mask, size=H * W, fill_value=-1)
    valid = ys >= 0
    thetas = jnp.linspace(0.0, jnp.pi, n_angles, endpoint=False)
    diag = jnp.sqrt(float(H * H + W * W))
    rhos = jnp.linspace(-diag, diag, n_rho)
    c = jnp.cos(thetas)
    s = jnp.sin(thetas)
    # rho for each point x each angle
    r = xs[:, None] * c[None] + ys[:, None] * s[None]  # (N, A)
    ri = jnp.clip(((r + diag) / (2 * diag) * n_rho).astype(jnp.int32), 0, n_rho - 1)
    acc = jnp.zeros((n_angles, n_rho))
    ai = jnp.broadcast_to(jnp.arange(n_angles)[None], ri.shape)
    acc = acc.at[ai.reshape(-1), ri.reshape(-1)].add(jnp.broadcast_to(valid[:, None], ri.shape).reshape(-1).astype(jnp.float32))
    return acc, thetas, rhos


@partial(jax.jit, static_argnames=("n_iters",))
def thinning(mask: jnp.ndarray, n_iters: int = 20) -> jnp.ndarray:
    """Morphological skeletonization (parity: cv::ximgproc::thinning —
    Zhang-Suen-class): iterative border deletion preserving connectivity,
    expressed with shifted-neighbor boolean logic."""
    m = mask.astype(bool)

    def neighbors(b):
        p2 = jnp.roll(b, 1, 0)
        p3 = jnp.roll(b, (1, -1), (0, 1))
        p4 = jnp.roll(b, -1, 1)
        p5 = jnp.roll(b, (-1, -1), (0, 1))
        p6 = jnp.roll(b, -1, 0)
        p7 = jnp.roll(b, (-1, 1), (0, 1))
        p8 = jnp.roll(b, 1, 1)
        p9 = jnp.roll(b, (1, 1), (0, 1))
        return p2, p3, p4, p5, p6, p7, p8, p9

    def subiter(b, phase):
        p2, p3, p4, p5, p6, p7, p8, p9 = neighbors(b)
        seq = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
        B = sum(p.astype(jnp.int32) for p in (p2, p3, p4, p5, p6, p7, p8, p9))
        A = sum(((~seq[i]) & seq[i + 1]).astype(jnp.int32) for i in range(8))
        cond = (B >= 2) & (B <= 6) & (A == 1)
        if phase == 0:
            cond = cond & ~(p2 & p4 & p6) & ~(p4 & p6 & p8)
        else:
            cond = cond & ~(p2 & p4 & p8) & ~(p2 & p6 & p8)
        return b & ~cond

    def body(b, _):
        b = subiter(b, 0)
        b = subiter(b, 1)
        return b, None

    out, _ = jax.lax.scan(body, m, None, length=n_iters)
    return out
