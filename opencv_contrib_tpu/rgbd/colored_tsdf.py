"""Colored TSDF volume: RGB fused alongside signed distance.

Reference anchors: rgbd/src/colored_tsdf.cpp (ColoredTSDFVolumeCPU:
integrate fuses RGB with the same weighted running average as tsdf;
raycast also interpolates color) and colored_kinfu.cpp (the driver).

TPU-first: identical gather formulation as rgbd.tsdf (every voxel samples
the frame), with a (X, Y, Z, 3) color grid fused in the same fully-fused
elementwise program; color raycast reuses tsdf.raycast's surface points and
does one trilinear color gather at the crossings.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3
from opencv_contrib_tpu.rgbd import tsdf as tsdf_mod


class ColoredTSDFVolume(NamedTuple):
    base: tsdf_mod.TSDFVolume
    color: jnp.ndarray  # (X, Y, Z, 3) float32 in [0, 1]


def create(resolution=(128, 128, 128), size: float = 3.0, center=(0.0, 0.0, 0.0),
           trunc_dist: float | None = None) -> ColoredTSDFVolume:
    base = tsdf_mod.create(resolution, size, center, trunc_dist)
    return ColoredTSDFVolume(base, jnp.zeros(base.dims + (3,), jnp.float32))


@jax.jit
def integrate(vol: ColoredTSDFVolume, depth: jnp.ndarray, rgb: jnp.ndarray,
              intr: jnp.ndarray, T_cw: jnp.ndarray, max_weight: float = 64.0,
              depth_max: float = 4.0) -> ColoredTSDFVolume:
    """Fuse one RGB-D frame (colored_tsdf.cpp integrate semantics)."""
    b = vol.base
    X, Y, Z = b.dims
    H, W = depth.shape
    gx = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 0)
    gy = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 1)
    gz = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 2)
    pw = jnp.stack([gx, gy, gz], axis=-1) * b.voxel_size + b.origin

    R, t = se3.mat_to_rt(T_cw)
    pc = jnp.einsum("ij,xyzj->xyzi", R, pw) + t
    z = pc[..., 2]
    u = pc[..., 0] / jnp.maximum(z, 1e-9) * intr[0] + intr[2]
    v = pc[..., 1] / jnp.maximum(z, 1e-9) * intr[1] + intr[3]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    uc = jnp.clip(ui, 0, W - 1)
    vc = jnp.clip(vi, 0, H - 1)
    d = depth[vc, uc]
    valid = inb & (d > 0) & (d < depth_max)

    sdf = d - z
    within = valid & (sdf > -b.trunc_dist)
    tsdf_new = jnp.clip(sdf / b.trunc_dist, -1.0, 1.0)
    # color only near the surface (|sdf| < trunc) like the reference
    near = within & (jnp.abs(sdf) < b.trunc_dist)
    c = rgb[vc, uc]  # (X, Y, Z, 3)

    w_old = b.weight
    w_add = within.astype(jnp.float32)
    w_new = jnp.minimum(w_old + w_add, max_weight)
    fused = jnp.where(within, (b.tsdf * w_old + tsdf_new * w_add) / jnp.maximum(w_old + w_add, 1.0), b.tsdf)
    cw_add = near.astype(jnp.float32)[..., None]
    color = jnp.where(
        near[..., None],
        (vol.color * w_old[..., None] + c * cw_add) / jnp.maximum(w_old[..., None] + cw_add, 1.0),
        vol.color,
    )
    return ColoredTSDFVolume(b._replace(tsdf=fused, weight=w_new), color)


def sample_color(vol: ColoredTSDFVolume, pts_world: jnp.ndarray):
    """Trilinear color at world points (raycast color fetch)."""
    b = vol.base
    g = (pts_world - b.origin) / b.voxel_size
    g0 = jnp.floor(g)
    f = g - g0
    X, Y, Z = b.dims

    def corner(dx, dy, dz):
        ix = jnp.clip(g0[..., 0].astype(jnp.int32) + dx, 0, X - 1)
        iy = jnp.clip(g0[..., 1].astype(jnp.int32) + dy, 0, Y - 1)
        iz = jnp.clip(g0[..., 2].astype(jnp.int32) + dz, 0, Z - 1)
        w = (
            jnp.where(dx, f[..., 0], 1 - f[..., 0])
            * jnp.where(dy, f[..., 1], 1 - f[..., 1])
            * jnp.where(dz, f[..., 2], 1 - f[..., 2])
        )
        return vol.color[ix, iy, iz] * w[..., None]

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                out = out + corner(dx, dy, dz)
    return out


from functools import partial


@partial(jax.jit, static_argnames=("shape", "n_steps"))
def raycast_colored(vol: ColoredTSDFVolume, intr: jnp.ndarray, T_cw: jnp.ndarray,
                    shape=(120, 160), n_steps: int = 192):
    """Raycast depth/normals from the base volume plus per-pixel color
    (colored_kinfu render path). Returns (points_cam, normals_cam, colors,
    valid)."""
    pts_cam, normals, valid = tsdf_mod.raycast(vol.base, intr, T_cw, shape, n_steps)
    T_wc = se3.inverse(T_cw)
    R_wc, t_wc = se3.mat_to_rt(T_wc)
    pts_world = jnp.einsum("ij,hwj->hwi", R_wc, pts_cam) + t_wc
    colors = sample_color(vol, pts_world)
    return pts_cam, normals, jnp.where(valid[..., None], colors, 0.0), valid
