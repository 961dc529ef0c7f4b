"""TV-L1 optical flow (Zach-Pock-Bischof primal-dual).

Parity: optflow's DualTVL1 (optflow/src/tvl1flow.cpp, deprecated copy of the
main-repo implementation; CUDA twin cudaoptflow/src/cuda/tvl1flow.cu).

TPU-first: the primal-dual iteration is a lax.scan of pure elementwise +
roll ops (VPU work, fully fused); warps per outer iteration are batched
bilinear gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import pyramid
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.image import sample_bilinear, sample_bilinear_multi, grid_coords, resize


def _grad(u):
    ux = jnp.roll(u, -1, 1) - u
    uy = jnp.roll(u, -1, 0) - u
    return uy, ux


def _div(py, px):
    return (py - jnp.roll(py, 1, 0)) + (px - jnp.roll(px, 1, 1))


@partial(jax.jit, static_argnames=("outer", "inner"))
def _tvl1_level(I0, I1, flow, lam: float = 15.0, theta: float = 0.3, tau: float = 0.25, outer: int = 5, inner: int = 30):
    gy1, gx1 = filters.gradients(I1)
    y, x = grid_coords(*I0.shape)
    maps = jnp.stack([I1, gy1, gx1])  # one corner-stacked gather for all 3

    def outer_body(carry, _):
        u, p = carry  # u (H,W,2); p dual (H,W,2,2)
        wy = y + u[..., 0]
        wx = x + u[..., 1]
        Iw, Iy, Ix = sample_bilinear_multi(maps, wy, wx)
        rho_c = Iw - Iy * u[..., 0] - Ix * u[..., 1] - I0
        grad2 = Iy * Iy + Ix * Ix + 1e-9

        def inner_body(carry2, _):
            u_, p_ = carry2
            # thresholding step (v update)
            rho = rho_c + Iy * u_[..., 0] + Ix * u_[..., 1]
            th = lam * theta * grad2
            d = jnp.where(
                rho < -th, lam * theta,
                jnp.where(rho > th, -lam * theta, -rho / grad2),
            )
            v = u_ + jnp.stack([Iy * d, Ix * d], axis=-1)
            # dual ascent on p, primal descent on u (TV)
            u_new = jnp.stack(
                [v[..., 0] + theta * _div(p_[..., 0, 0], p_[..., 0, 1]),
                 v[..., 1] + theta * _div(p_[..., 1, 0], p_[..., 1, 1])], axis=-1
            )
            gyu, gxu = _grad(u_new[..., 0])
            gyv, gxv = _grad(u_new[..., 1])
            g = jnp.stack([jnp.stack([gyu, gxu], -1), jnp.stack([gyv, gxv], -1)], axis=-2)
            p_new = p_ + (tau / theta) * g
            nrm = jnp.maximum(1.0, jnp.linalg.norm(p_new, axis=-1, keepdims=True))
            return (u_new, p_new / nrm), None

        (u, p), _ = jax.lax.scan(inner_body, (u, p), None, length=inner)
        u = jnp.stack([filters.median_filter3(u[..., 0]), filters.median_filter3(u[..., 1])], axis=-1)
        return (u, p), None

    p0 = jnp.zeros(I0.shape + (2, 2))
    (flow, _), _ = jax.lax.scan(outer_body, (flow, p0), None, length=outer)
    return flow


def compute(I0, I1, levels: int = 4, lam: float = 15.0, outer: int = 5, inner: int = 30):
    """TV-L1 dense flow I0 -> I1 -> (H, W, 2) (dy, dx)."""
    I0 = jnp.asarray(I0, jnp.float32)
    I1 = jnp.asarray(I1, jnp.float32)
    p0 = pyramid.build_pyramid(I0, levels)
    p1 = pyramid.build_pyramid(I1, levels)
    flow = jnp.zeros(p0[-1].shape + (2,))
    for l in reversed(range(levels)):
        if flow.shape[:2] != p0[l].shape:
            flow = resize(flow, p0[l].shape) * 2.0
        flow = _tvl1_level(p0[l], p1[l], flow, lam=lam, outer=outer, inner=inner)
    return flow
