"""Quasi-dense stereo: sparse seeds grown to a quasi-dense disparity map.

Reference anchor: stereo/src/quasi_dense_stereo.cpp
(QuasiDenseStereo::process — sparse texture seeds, best-first region
growing with ZNCC validation and disparity-gradient limits,
quasi_dense_stereo.hpp:96,164).

TPU-first: the reference's priority-queue best-first growth becomes
synchronous wavefront sweeps over a precomputed ZNCC volume: the ZNCC of
every pixel at every integer disparity is one batched box-filter pass per
disparity (windows stay shift-consistent), then each sweep lets every
unassigned pixel adopt the best neighboring disparity (+-1) whose ZNCC
passes the gate — a fused stencil + gather program per sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.stereo.matching import block_match


@partial(jax.jit, static_argnames=("max_disp", "radius"))
def zncc_volume(left, right, max_disp: int, radius: int = 2):
    """(D+1, H, W) ZNCC between left windows and right windows shifted by
    each integer disparity — windows are shift-consistent by construction."""
    W = left.shape[1]

    def mean(x):
        return filters.box_filter(x, radius)

    ml = mean(left)
    vl = jnp.maximum(mean(left * left) - ml * ml, 1e-6)

    def one(d):
        xs = jnp.arange(W)
        xr = jnp.clip(xs - d, 0, W - 1)
        r = right[:, xr]
        mr = mean(r)
        cov = mean(left * r) - ml * mr
        vr = jnp.maximum(mean(r * r) - mr * mr, 1e-6)
        return cov / jnp.sqrt(vl * vr)

    return jax.vmap(one)(jnp.arange(max_disp + 1))


@partial(jax.jit, static_argnames=("n_sweeps",))
def grow(zvol, seed_disp, seed_valid, n_sweeps: int = 48, zncc_thresh: float = 0.6):
    """Wavefront growth from seeds over the ZNCC volume. Disparities are
    integer indices into zvol. Returns (disp, valid)."""
    D1, H, W = zvol.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def sweep(state, _):
        disp, valid = state
        best_z = jnp.where(valid, 2.0, -jnp.inf)
        best_d = disp
        p_d = jnp.pad(disp, 1)
        p_v = jnp.pad(valid, 1)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            nd = p_d[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            nv = p_v[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            for dd in (-1, 0, 1):
                cand = jnp.clip(nd + dd, 0, D1 - 1)
                z = zvol[cand, yy, xx]
                score = jnp.where(nv & (z > zncc_thresh), z, -jnp.inf)
                upd = (~valid) & (score > best_z)
                best_z = jnp.where(upd, score, best_z)
                best_d = jnp.where(upd, cand, best_d)
        new_valid = valid | (best_z > -jnp.inf)
        return (best_d, new_valid), None

    (disp, valid), _ = jax.lax.scan(sweep, (seed_disp, seed_valid), None, length=n_sweeps)
    return disp, valid


def quasi_dense_stereo(left, right, max_disp: int = 32, seed_stride: int = 8,
                       zncc_thresh: float = 0.6, n_sweeps: int = 48, radius: int = 2):
    """Full quasi-dense pipeline (QuasiDenseStereo::process): block-matched
    seeds on a sparse grid (high-confidence only) -> ZNCC-gated growth.
    Returns (disp (H, W) int32, valid (H, W))."""
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    disp_bm, conf = block_match(left, right, max_disp=max_disp)
    H, W = left.shape
    zvol = zncc_volume(left, right, max_disp, radius)
    d_int = jnp.clip(jnp.round(disp_bm).astype(jnp.int32), 0, max_disp)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    z_at = zvol[d_int, yy, xx]
    grid = jnp.zeros((H, W), bool).at[::seed_stride, ::seed_stride].set(True)
    seeds = grid & conf & (z_at > 0.8)
    return grow(zvol, jnp.where(seeds, d_int, 0), seeds,
                n_sweeps=n_sweeps, zncc_thresh=zncc_thresh)
