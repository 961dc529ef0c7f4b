"""Line segment detection + LBD-class band descriptors."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ximgproc.edges import fast_hough_lines
from opencv_contrib_tpu.ops.image import sample_bilinear


def detect_line_segments(img: jnp.ndarray, max_lines: int = 16, edge_thresh: float = 0.2, min_support: int = 20):
    """Detect straight line segments: edge map -> Hough peaks -> segment
    endpoints from the extent of on-line edge support.

    Returns (segments (max_lines, 4) [y0, x0, y1, x1], valid (max_lines,))."""
    gy, gx = filters.gradients(filters.gaussian_blur(img, 1.0))
    mag = jnp.sqrt(gy * gy + gx * gx)
    edges = mag > edge_thresh * jnp.maximum(mag.max(), 1e-9)
    acc, thetas, rhos = fast_hough_lines(edges)
    A, Rn = acc.shape
    # NMS on the accumulator + top-k peaks
    mx = jax.lax.reduce_window(acc, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME")
    peaks = jnp.where((acc >= mx) & (acc >= min_support), acc, -jnp.inf).reshape(-1)
    _, top = jax.lax.top_k(peaks, max_lines)
    valid = peaks[top] > 0
    ti = top // Rn
    ri = top % Rn
    theta = thetas[ti]
    rho = rhos[ri]

    # for each line, find the support extent by scanning positions along it
    H, W = img.shape
    L = int(np.hypot(H, W))
    s = jnp.linspace(-L / 2, L / 2, 2 * L)
    c, sn = jnp.cos(theta), jnp.sin(theta)
    # point on line: (x0, y0) = rho*(c, s); direction (-s, c)
    cx = rho * c
    cy = rho * sn
    px = cx[:, None] - sn[:, None] * s[None]
    py = cy[:, None] + c[:, None] * s[None]
    inb = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    on_edge = sample_bilinear(edges.astype(jnp.float32), py, px) > 0.3
    sup = inb & on_edge
    # first/last supported sample
    idx = jnp.arange(s.shape[0])
    first = jnp.min(jnp.where(sup, idx[None], s.shape[0]), axis=1)
    last = jnp.max(jnp.where(sup, idx[None], -1), axis=1)
    ok = valid & (last > first)
    f = jnp.clip(first, 0, s.shape[0] - 1)
    l = jnp.clip(last, 0, s.shape[0] - 1)
    y0 = cy + c * s[f]
    x0 = cx - sn * s[f]
    y1 = cy + c * s[l]
    x1 = cx - sn * s[l]
    segs = jnp.stack([y0, x0, y1, x1], axis=1)
    return segs * ok[:, None], ok


@partial(jax.jit, static_argnames=("n_bands", "band_width", "n_samples"))
def lbd_describe(img: jnp.ndarray, segments: jnp.ndarray, valid: jnp.ndarray, n_bands: int = 9, band_width: int = 3, n_samples: int = 32):
    """Line Band Descriptor: for each segment, sample gradient statistics in
    n_bands bands parallel to the line -> (L, n_bands * 4) float descriptor,
    L2-normalized (BinaryDescriptor's LBD float stage)."""
    gy, gx = filters.gradients(filters.gaussian_blur(img, 1.0))
    y0, x0, y1, x1 = segments[:, 0], segments[:, 1], segments[:, 2], segments[:, 3]
    dy = y1 - y0
    dx = x1 - x0
    length = jnp.sqrt(dy * dy + dx * dx) + 1e-9
    uy, ux = dy / length, dx / length  # along-line
    ny, nx = -ux, uy  # normal

    t = jnp.linspace(0.0, 1.0, n_samples)
    feats = []
    for b in range(n_bands):
        off = (b - (n_bands - 1) / 2.0) * band_width
        sy = y0[:, None] + dy[:, None] * t[None] + ny[:, None] * off
        sx = x0[:, None] + dx[:, None] * t[None] + nx[:, None] * off
        g1 = sample_bilinear(gy, sy, sx)
        g2 = sample_bilinear(gx, sy, sx)
        # project gradients onto line frame
        g_par = g1 * uy[:, None] + g2 * ux[:, None]
        g_perp = g1 * ny[:, None] + g2 * nx[:, None]
        feats += [
            jnp.mean(jnp.maximum(g_perp, 0), axis=1),
            jnp.mean(jnp.maximum(-g_perp, 0), axis=1),
            jnp.mean(jnp.maximum(g_par, 0), axis=1),
            jnp.mean(jnp.maximum(-g_par, 0), axis=1),
        ]
    d = jnp.stack(feats, axis=1)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-9)
    return d * valid[:, None]
