"""Gauss-Newton parametric registration.

Models (parameter vectors p):
- "shift":      p = (dy, dx)
- "euclidean":  p = (angle, dy, dx)
- "similarity": p = (log_scale, angle, dy, dx)
- "affine":     p = 6 (row-major 2x3 delta from identity)
- "projective": p = 8 (3x3 with h22 = 1)

register(img_ref, img_mov) finds p so that mov warped by p matches ref
(same contract as Mapper::calculate returning a Map that warps img2 into
img1's frame).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import pyramid
from opencv_contrib_tpu.ops.image import sample_bilinear, grid_coords

MODELS = ("shift", "euclidean", "similarity", "affine", "projective")


def _n_params(model: str) -> int:
    return {"shift": 2, "euclidean": 3, "similarity": 4, "affine": 6, "projective": 8}[model]


def _warp_coords(model: str, p: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray, cy: float, cx: float):
    """Map output coords -> source coords under parameters p."""
    yc = y - cy
    xc = x - cx
    if model == "shift":
        return y + p[0], x + p[1]
    if model == "euclidean":
        c, s = jnp.cos(p[0]), jnp.sin(p[0])
        ys = s * xc + c * yc + cy + p[1]
        xs = c * xc - s * yc + cx + p[2]
        return ys, xs
    if model == "similarity":
        sc = jnp.exp(p[0])
        c, s = sc * jnp.cos(p[1]), sc * jnp.sin(p[1])
        ys = s * xc + c * yc + cy + p[2]
        xs = c * xc - s * yc + cx + p[3]
        return ys, xs
    if model == "affine":
        xs = (1.0 + p[0]) * xc + p[1] * yc + cx + p[2]
        ys = p[3] * xc + (1.0 + p[4]) * yc + cy + p[5]
        return ys, xs
    if model == "projective":
        d = p[6] * xc + p[7] * yc + 1.0
        d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        xs = ((1.0 + p[0]) * xc + p[1] * yc + p[2]) / d + cx
        ys = (p[3] * xc + (1.0 + p[4]) * yc + p[5]) / d + cy
        return ys, xs
    raise ValueError(model)


def warp_with_params(model: str, p: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Warp img by parameters p (output(y,x) = img(warp(y,x)))."""
    H, W = img.shape
    y, x = grid_coords(H, W)
    ys, xs = _warp_coords(model, p, y, x, H / 2.0, W / 2.0)
    return sample_bilinear(img, ys, xs)


@partial(jax.jit, static_argnames=("model", "iters"))
def _register_level(model: str, p0, ref, mov, iters: int = 20, huber_delta: float = 0.1):
    H, W = ref.shape
    y, x = grid_coords(H, W)
    cy, cx = H / 2.0, W / 2.0
    # ignore borders where warps read out of bounds
    border = max(2, int(0.08 * min(H, W)))
    mask = jnp.zeros((H, W)).at[border:-border, border:-border].set(1.0)

    def residual(p):
        ys, xs = _warp_coords(model, p, y, x, cy, cx)
        warped = sample_bilinear(mov, ys, xs)
        return ((warped - ref) * mask).reshape(-1)

    def body(p, _):
        r = residual(p)
        # IRLS Huber weights: occlusions/outliers get |r|^-1 influence
        # (the robust-loss item of the reference's Mapper gradient methods)
        w = jnp.minimum(1.0, huber_delta / jnp.maximum(jnp.abs(r), 1e-9))
        J = jax.jacfwd(residual)(p)  # (HW, P)
        Jw = J * w[:, None]
        Hm = Jw.T @ J + 1e-6 * jnp.eye(p.shape[0])
        dp = jnp.linalg.solve(Hm, Jw.T @ r)
        return p - dp, jnp.sum(w * r * r)

    p, costs = jax.lax.scan(body, p0, None, length=iters)
    return p, costs[-1]


def register_pyramid(ref, mov, model: str = "affine", levels: int | None = 3,
                     iters: int = 20, expected_motion_px: float | None = None):
    """Coarse-to-fine registration (MapperPyramid contract). Returns params p
    such that warp_with_params(model, p, mov) ~= ref.

    levels=None picks the depth automatically: deep enough that the
    expected motion shrinks below ~2 px at the coarsest level (the
    "scale pyramid depth with expected motion" rule), bounded by image
    size."""
    ref = jnp.asarray(ref, jnp.float32)
    mov = jnp.asarray(mov, jnp.float32)
    if levels is None:
        import math

        motion = expected_motion_px if expected_motion_px is not None else 0.05 * min(ref.shape)
        need = max(1, int(math.ceil(math.log2(max(motion, 1.0) / 2.0))) + 1)
        cap = max(1, int(math.log2(min(ref.shape) / 16)))
        levels = int(min(max(need, 2), cap))
    pr = pyramid.build_pyramid(ref, levels)
    pm = pyramid.build_pyramid(mov, levels)
    p = jnp.zeros(_n_params(model), jnp.float32)
    for l in reversed(range(levels)):
        p, cost = _register_level(model, p, pr[l], pm[l], iters=iters)
        if l > 0:  # upscale translation-like params
            if model == "shift":
                p = p * 2.0
            elif model == "euclidean":
                p = p.at[1:].mul(2.0)
            elif model == "similarity":
                p = p.at[2:].mul(2.0)
            elif model == "affine":
                p = p.at[jnp.array([2, 5])].mul(2.0)
            elif model == "projective":
                p = p.at[jnp.array([2, 5])].mul(2.0).at[jnp.array([6, 7])].mul(0.5)
    return p
