"""Sampling, warping, resizing — the cudawarping-class primitives.

Reference capability covered: cv::cuda::{resize, warpAffine, warpPerspective,
remap, pyrDown/pyrUp} (cudawarping module) and the bilinear samplers embedded
in every tracker/flow kernel.

TPU-first: gather-based bilinear sampling over flat indices; all shapes
static; batched via leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """img (H, W) or (H, W, C); integer index arrays of identical shape S ->
    values (S) or (S, C). Indices are clipped to the image."""
    H, W = img.shape[0], img.shape[1]
    yi = jnp.clip(yi, 0, H - 1)
    xi = jnp.clip(xi, 0, W - 1)
    flat = img.reshape((H * W,) + img.shape[2:])
    return jnp.take(flat, yi * W + xi, axis=0)


def sample_nearest(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return _gather2d(img, jnp.round(y).astype(jnp.int32), jnp.round(x).astype(jnp.int32))


def sample_bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W[, C]) at float coords y, x (any shape).

    Border: clamp (BORDER_REPLICATE semantics).
    """
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0)[..., None] if img.ndim == 3 else (y - y0)
    wx = (x - x0)[..., None] if img.ndim == 3 else (x - x0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    v00 = _gather2d(img, y0i, x0i)
    v01 = _gather2d(img, y0i, x0i + 1)
    v10 = _gather2d(img, y0i + 1, x0i)
    v11 = _gather2d(img, y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def sample_windows(img: jnp.ndarray, pts_yx: jnp.ndarray, radius: int,
                   flow_yx: jnp.ndarray | None = None) -> jnp.ndarray:
    """Bilinear-sample square windows of integer offsets around float
    centers: out[n, m] = img(pts[n] + offs[m] [+ flow[n]]), offs the
    (2r+1)^2 grid.

    The LK/DIS window shape: because offsets are INTEGER, the bilinear
    fraction is constant across a window, so instead of (N*M) pointwise
    gathers (the generic sample_bilinear path — 764 ms/frame inside DIS at
    VGA) this does (a) one row gather per (point, dy) on a y-pair-stacked
    image (y blend = two columns of the same gathered row), then (b) the
    x window cut + blend as a per-point one-hot batched dot over W — the
    compare fuses into the dot (same trick as ops.histogram), so the MXU
    does the x selection. 764 -> ~25 ms measured for the DIS patch stage.

    Border: clamp-ish (indices clipped; the y-pair stack wraps the last
    row, matching clamped bilinear to within the border row).
    """
    H, W = img.shape
    M = 2 * radius + 1
    py = pts_yx[:, 0] + (flow_yx[:, 0] if flow_yx is not None else 0.0)
    px = pts_yx[:, 1] + (flow_yx[:, 1] if flow_yx is not None else 0.0)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0)[:, None]          # (N, 1)
    fx = (px - x0)[:, None]          # (N, 1)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    # (a) y rows: gather (N, M) rows from [img | img shifted up by 1].
    # Edge-replicated shift (NOT roll): for windows touching the bottom row
    # the y1 sample must clamp to the last row (BORDER_REPLICATE, matching
    # sample_bilinear) instead of wrapping to row 0.
    img_dn = jnp.concatenate([img[1:], img[-1:]], axis=0)
    G = jnp.concatenate([img, img_dn], axis=1)  # (H, 2W)
    ridx = jnp.clip(y0i[:, None] + offs[None, :], 0, H - 1)   # (N, M)
    rows = G[ridx.reshape(-1)].reshape(-1, M, 2 * W)
    rowsY = rows[..., :W] * (1.0 - fy[..., None]) + rows[..., W:] * fy[..., None]

    # (b) x cut+blend: sel[n, x, j] one-hot pair; fused into the dot
    xs = jnp.arange(W, dtype=jnp.int32)[None, :, None]        # (1, W, 1)
    xt = jnp.clip(x0i[:, None, None] + offs[None, None, :], 0, W - 1)
    sel = ((xs == xt).astype(jnp.float32) * (1.0 - fx[..., None])
           + (xs == jnp.clip(xt + 1, 0, W - 1)).astype(jnp.float32)
           * fx[..., None])                                   # (N, W, M)
    out = jax.lax.dot_general(
        rowsY, sel, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # (N, M, M)
    return out.reshape(pts_yx.shape[0], M * M)


def sample_bilinear_multi(maps: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample C maps (C, H, W) at shared float coords — ONE gather.

    TPU gathers pay per row; a small minor-dim vector rides along free. The
    4 bilinear corners of all C maps are stacked into (H*W, 4C) rows so the
    whole sampling is a single gather (measured ~11x faster than 4C
    separate gathers for C=2 at 1024x400 samples on v5e). Border: clamp.
    Returns (C, *y.shape).
    """
    C, H, W = maps.shape
    m01 = jnp.roll(maps, -1, 2)
    m10 = jnp.roll(maps, -1, 1)
    m11 = jnp.roll(m10, -1, 2)
    T = jnp.concatenate([maps, m01, m10, m11], axis=0).reshape(4 * C, -1).T  # (H*W, 4C)
    yc = jnp.clip(y, 0.0, H - 1.001)
    xc = jnp.clip(x, 0.0, W - 1.001)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    fy = yc - y0
    fx = xc - x0
    rows = T[y0 * W + x0]  # (*y.shape, 4C)
    w = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx])  # (4, ...)
    r = jnp.moveaxis(rows, -1, 0).reshape((4, C) + y.shape)
    return (r * w[:, None]).sum(0)


def sample_bilinear_valid(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Bilinear sample + in-bounds mask (True where the full 2x2 footprint is
    inside the image)."""
    H, W = img.shape[0], img.shape[1]
    valid = (y >= 0) & (y <= H - 1) & (x >= 0) & (x <= W - 1)
    return sample_bilinear(img, y, x), valid


def grid_coords(H: int, W: int, dtype=jnp.float32):
    """Pixel-center coordinate grids (y, x), each (H, W)."""
    y = jax.lax.broadcasted_iota(dtype, (H, W), 0)
    x = jax.lax.broadcasted_iota(dtype, (H, W), 1)
    return y, x


def _resize_matrix(n_out: int, n_in: int, method: str) -> jnp.ndarray:
    """(n_out, n_in) 1D interpolation operator (pixel-center aligned,
    clamped borders). Two-tap rows for 'linear', one-tap for 'nearest'."""
    s = n_in / n_out
    ys = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * s - 0.5
    cols = jnp.arange(n_in, dtype=jnp.float32)[None, :]
    if method == "nearest":
        yi = jnp.clip(jnp.round(ys), 0, n_in - 1)[:, None]
        return (cols == yi).astype(jnp.float32)
    y0 = jnp.floor(ys)
    f = (ys - y0)[:, None]
    y0c = jnp.clip(y0, 0, n_in - 1)[:, None]
    y1c = jnp.clip(y0 + 1, 0, n_in - 1)[:, None]
    return ((cols == y0c) * (1.0 - f) + (cols == y1c) * f).astype(jnp.float32)


def resize(img: jnp.ndarray, out_hw, method: str = "linear") -> jnp.ndarray:
    """Resize (H, W[, C]) to out_hw. 'linear' | 'nearest' | 'area'.

    Separable formulation: out = My @ img @ Mx^T with 1- or 2-tap
    interpolation matrices — the MXU does the resampling instead of
    per-pixel gathers (gathers pay per row; the gather formulation cost
    ~10 ms inside saliency.spectral_residual at VGA->64^2)."""
    Ho, Wo = out_hw
    H, W = img.shape[0], img.shape[1]
    if (Ho, Wo) == (H, W):
        return img
    if method == "area" and H % Ho == 0 and W % Wo == 0:
        fy, fx = H // Ho, W // Wo
        v = img.reshape((Ho, fy, Wo, fx) + img.shape[2:])
        return v.mean(axis=(1, 3))
    My = _resize_matrix(Ho, H, method)
    Mx = _resize_matrix(Wo, W, method)
    dot = lambda a, b, dims: jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32)
    if img.ndim == 2:
        rows = dot(My, img.astype(jnp.float32), ((1,), (0,)))  # (Ho, W)
        return dot(rows, Mx, ((1,), (1,)))  # (Ho, Wo)
    C = img.shape[2]
    flat = img.astype(jnp.float32).reshape(H, W * C)
    rows = dot(My, flat, ((1,), (0,))).reshape(Ho, W, C)
    return jnp.einsum("hwc,ow->hoc", rows, Mx,
                      precision=jax.lax.Precision.HIGHEST)


def warp_affine(img: jnp.ndarray, M: jnp.ndarray, out_hw=None) -> jnp.ndarray:
    """Inverse-warp with a 2x3 affine matrix mapping OUTPUT -> INPUT coords
    (i.e. `M` plays the role of cv::warpAffine's WARP_INVERSE_MAP matrix)."""
    if out_hw is None:
        out_hw = img.shape[:2]
    y, x = grid_coords(*out_hw)
    xs = M[0, 0] * x + M[0, 1] * y + M[0, 2]
    ys = M[1, 0] * x + M[1, 1] * y + M[1, 2]
    return sample_bilinear(img, ys, xs)


def warp_perspective(img: jnp.ndarray, Hm: jnp.ndarray, out_hw=None) -> jnp.ndarray:
    """Inverse-warp with a 3x3 homography mapping OUTPUT -> INPUT coords."""
    if out_hw is None:
        out_hw = img.shape[:2]
    y, x = grid_coords(*out_hw)
    d = Hm[2, 0] * x + Hm[2, 1] * y + Hm[2, 2]
    d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    xs = (Hm[0, 0] * x + Hm[0, 1] * y + Hm[0, 2]) / d
    ys = (Hm[1, 0] * x + Hm[1, 1] * y + Hm[1, 2]) / d
    return sample_bilinear(img, ys, xs)


def remap(img: jnp.ndarray, map_y: jnp.ndarray, map_x: jnp.ndarray) -> jnp.ndarray:
    """cv::remap equivalent: per-pixel source coordinates."""
    return sample_bilinear(img, map_y, map_x)


def extract_patches(img: jnp.ndarray, centers_yx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Extract N bilinear patches (N, size, size) around float centers (N, 2).

    The per-keypoint patch gather used by descriptor kernels (the role of the
    rotated-patch resampling in surf.cpp:679 and beblid.cpp box sampling).
    """
    off = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    dy = off[:, None]
    dx = off[None, :]
    ys = centers_yx[:, 0][:, None, None] + dy[None]
    xs = centers_yx[:, 1][:, None, None] + dx[None]
    return sample_bilinear(img, ys, xs)


def extract_rotated_patches(
    img: jnp.ndarray, centers_yx: jnp.ndarray, angles: jnp.ndarray, scales: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Rotated+scaled patch extraction for oriented descriptors (the role of
    SURF's rotated 20s-patch resample, surf.cpp:679-…)."""
    off = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    gy = off[:, None] * jnp.ones((1, size))
    gx = jnp.ones((size, 1)) * off[None, :]
    c = jnp.cos(angles)[:, None, None] * scales[:, None, None]
    s = jnp.sin(angles)[:, None, None] * scales[:, None, None]
    xs = centers_yx[:, 1][:, None, None] + c * gx[None] - s * gy[None]
    ys = centers_yx[:, 0][:, None, None] + s * gx[None] + c * gy[None]
    return sample_bilinear(img, ys, xs)
