"""Block matching + semi-global matching on cost volumes.

Census transform parity: stereo/src/descriptor.cpp (binary census kernels);
BM parity: StereoBinaryBM; SGM parity: StereoBinarySGBM's path aggregation
(simplified to 4 scan directions, P1/P2 penalties).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


def census_transform(img: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Census bit-string per pixel packed into int32 (window up to 5x5->24
    bits + sign handling); parity with the stereo module's census
    descriptors."""
    bits = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            bits.append(jnp.roll(img, (dy, dx), (0, 1)) < img)
    out = jnp.zeros(img.shape, jnp.int32)
    for i, b in enumerate(bits):
        out = out | (b.astype(jnp.int32) << i)
    return out


def _shift_right_img(right: jnp.ndarray, d: int) -> jnp.ndarray:
    """right image shifted so column x aligns with left x - d."""
    return jnp.roll(right, d, axis=1)


def cost_volume_sad(left, right, max_disp: int, block_radius: int = 3):
    """(D, H, W) SAD cost volume with box aggregation."""
    costs = []
    for d in range(max_disp):
        ad = jnp.abs(left - _shift_right_img(right, d))
        costs.append(filters.box_filter(ad, block_radius))
    return jnp.stack(costs)


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def cost_volume_census(left, right, max_disp: int, radius: int = 2, agg_radius: int = 2):
    cl = census_transform(left, radius)
    cr = census_transform(right, radius)
    costs = []
    for d in range(max_disp):
        h = _popcount32(cl ^ _shift_right_img(cr, d)).astype(jnp.float32)
        costs.append(filters.box_filter(h, agg_radius))
    return jnp.stack(costs)


@partial(jax.jit, static_argnames=("max_disp", "block_radius"))
def block_match(left, right, max_disp: int = 32, block_radius: int = 3, uniqueness: float = 1.05):
    """StereoBM-class: winner-take-all over the SAD volume + uniqueness gate.
    Returns (disparity (H, W) float32, valid (H, W))."""
    vol = cost_volume_sad(left, right, max_disp, block_radius)  # (D, H, W)
    disp = jnp.argmin(vol, axis=0)
    best = jnp.min(vol, axis=0)
    # uniqueness: second-best (excluding +-1 neighborhood) must be clearly worse
    D = max_disp
    didx = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 0)
    near = jnp.abs(didx - disp[None]) <= 1
    second = jnp.min(jnp.where(near, jnp.inf, vol), axis=0)
    valid = (second >= uniqueness * best) & (disp > 0) & (disp < D - 1)
    # parabolic sub-pixel refinement
    dm = jnp.clip(disp, 1, D - 2)
    c0 = jnp.take_along_axis(vol, (dm - 1)[None], axis=0)[0]
    c1 = jnp.take_along_axis(vol, dm[None], axis=0)[0]
    c2 = jnp.take_along_axis(vol, (dm + 1)[None], axis=0)[0]
    denom = c0 - 2 * c1 + c2
    offset = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), 0.0)
    return disp.astype(jnp.float32) + jnp.clip(offset, -0.5, 0.5), valid


def _sgm_scan(vol, axis: int, reverse: bool, P1: float, P2: float):
    """Directional DP along one image axis: L(d) = C(d) + min(Lp(d),
    Lp(d±1)+P1, min_d Lp + P2) - min_d Lp."""
    D = vol.shape[0]
    # move scan axis to front: lines (H or W) sequence of (D, L) slices
    v = jnp.moveaxis(vol, axis + 1, 1)  # (D, S, L)
    v = jnp.moveaxis(v, 1, 0)  # (S, D, L)
    if reverse:
        v = v[::-1]

    def step(Lp, C):
        m = jnp.min(Lp, axis=0)
        up = jnp.concatenate([Lp[1:], jnp.full((1,) + Lp.shape[1:], jnp.inf)], axis=0)
        dn = jnp.concatenate([jnp.full((1,) + Lp.shape[1:], jnp.inf), Lp[:-1]], axis=0)
        L = C + jnp.minimum(jnp.minimum(Lp, jnp.minimum(up, dn) + P1), m[None] + P2) - m[None]
        return L, L

    _, out = jax.lax.scan(step, v[0], v[1:])
    out = jnp.concatenate([v[:1], out], axis=0)
    if reverse:
        out = out[::-1]
    out = jnp.moveaxis(out, 0, 1)  # (D, S, L)
    return jnp.moveaxis(out, 1, axis + 1)


@partial(jax.jit, static_argnames=("P1", "P2"))
def sgm_aggregate(vol: jnp.ndarray, P1: float = 1.0, P2: float = 8.0) -> jnp.ndarray:
    """4-direction SGM aggregation (left/right/up/down scans)."""
    agg = (
        _sgm_scan(vol, 1, False, P1, P2)
        + _sgm_scan(vol, 1, True, P1, P2)
        + _sgm_scan(vol, 0, False, P1, P2)
        + _sgm_scan(vol, 0, True, P1, P2)
    )
    return agg


@partial(jax.jit, static_argnames=("max_disp", "census_radius"))
def sgm_match(left, right, max_disp: int = 32, census_radius: int = 2, P1: float = 1.0, P2: float = 8.0):
    """StereoSGBM-class census + SGM pipeline -> (disparity, valid)."""
    vol = cost_volume_census(left, right, max_disp, census_radius)
    agg = sgm_aggregate(vol, P1, P2)
    disp = jnp.argmin(agg, axis=0).astype(jnp.float32)
    valid = (disp > 0) & (disp < max_disp - 1)
    return disp, valid


def lr_consistency(disp_l, disp_r, max_diff: float = 1.0):
    """Left-right check: disparity consistent when d_L(x) == d_R(x - d)."""
    H, W = disp_l.shape
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    xr = jnp.clip(x - disp_l.astype(jnp.int32), 0, W - 1)
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    dr = disp_r[y, xr]
    return jnp.abs(disp_l - dr) <= max_diff
