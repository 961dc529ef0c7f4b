"""Sparse (hashed-block) TSDF volume.

Parity: rgbd/src/hash_tsdf.cpp — VolumeUnit map of 16^3 blocks lazily
allocated along the truncation band (:81-91, AllocateVolumeUnitsInvoker
:190), per-unit integration, cross-unit raycast.

TPU-first redesign (SURVEY §5.7b): the unordered_map becomes a
fixed-capacity block pool: `coords (N, 3)` int32 block indices + `tsdf/
weight (N, B, B, B)` voxel data + a validity mask. Allocation = compaction
of the set of blocks touched by the depth frame (dedup via sort), lookup =
binary search over the sorted coord keys (log-depth gather, no host trip).
All shapes static; overflow drops lowest-priority new blocks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.core import se3


B = 8  # voxels per block side (8^3 = 512 voxels/block — VPU-lane friendly)


class HashTSDF(NamedTuple):
    keys: jnp.ndarray  # (N,) int32 sorted packed block coords (active first)
    coords: jnp.ndarray  # (N, 3) int32 block indices (parallel to keys)
    tsdf: jnp.ndarray  # (N, B, B, B)
    weight: jnp.ndarray  # (N, B, B, B)
    active: jnp.ndarray  # (N,) bool
    voxel_size: jnp.ndarray  # scalar
    trunc_dist: jnp.ndarray  # scalar

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


_BITS = 10
_OFFSET = 1 << (_BITS - 1)  # block indices in [-512, 512): +/-82 m at 8x0.02 m blocks
_EMPTY_KEY = jnp.int32((1 << 31) - 1)


def _pack(coords: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(coords.astype(jnp.int32) + _OFFSET, 0, (1 << _BITS) - 1)
    return (c[..., 0] << (2 * _BITS)) | (c[..., 1] << _BITS) | c[..., 2]


def create(capacity: int = 4096, voxel_size: float = 0.02, trunc_dist: float | None = None) -> HashTSDF:
    if trunc_dist is None:
        trunc_dist = 5.0 * voxel_size
    return HashTSDF(
        keys=jnp.full((capacity,), _EMPTY_KEY, jnp.int32),
        coords=jnp.zeros((capacity, 3), jnp.int32),
        tsdf=jnp.zeros((capacity, B, B, B), jnp.float32),
        weight=jnp.zeros((capacity, B, B, B), jnp.float32),
        active=jnp.zeros((capacity,), bool),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
        trunc_dist=jnp.asarray(trunc_dist, jnp.float32),
    )


def _lookup(keys_sorted: jnp.ndarray, query_keys: jnp.ndarray):
    """Binary-search lookup: -> (slot indices, found mask)."""
    idx = jnp.searchsorted(keys_sorted, query_keys)
    idx = jnp.clip(idx, 0, keys_sorted.shape[0] - 1)
    found = keys_sorted[idx] == query_keys
    return idx, found


@jax.jit
def allocate(vol: HashTSDF, depth: jnp.ndarray, intr: jnp.ndarray, T_cw: jnp.ndarray, depth_max: float = 4.0) -> HashTSDF:
    """Allocate blocks along the truncation band of the depth frame
    (AllocateVolumeUnitsInvoker contract): back-project each valid pixel at
    depth±trunc, collect touched blocks, merge new ones into the pool."""
    H, W = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    valid = (depth > 0) & (depth < depth_max)
    T_wc = se3.inverse(T_cw)
    R, t = se3.mat_to_rt(T_wc)

    rays = jnp.stack([(u - intr[2]) / intr[0], (v - intr[3]) / intr[1], jnp.ones((H, W))], axis=-1)
    new_keys = []
    block_m = B * vol.voxel_size
    for band in (-1.0, 0.0, 1.0):
        d = depth + band * vol.trunc_dist
        pc = rays * d[..., None]
        pw = jnp.einsum("ij,hwj->hwi", R, pc) + t
        bc = jnp.floor(pw / block_m).astype(jnp.int32)
        k = jnp.where(valid, _pack(bc), _EMPTY_KEY)
        new_keys.append(k.reshape(-1))
    cand = jnp.concatenate(new_keys)

    # dedup candidates: sort + keep first occurrence
    cand_sorted = jnp.sort(cand)
    first = jnp.concatenate([jnp.array([True]), cand_sorted[1:] != cand_sorted[:-1]])
    uniq = jnp.where(first, cand_sorted, _EMPTY_KEY)
    uniq = jnp.sort(uniq)  # unique keys first, empties at the end

    # drop those already present
    _, found = _lookup(vol.keys, uniq)
    fresh = jnp.where(~found & (uniq != _EMPTY_KEY), uniq, _EMPTY_KEY)
    fresh = jnp.sort(fresh)

    # merge: concatenate pool keys + fresh, sort, keep capacity slots.
    # Data arrays are re-gathered by key order.
    n = vol.capacity
    all_keys = jnp.concatenate([vol.keys, fresh[:n]])
    order = jnp.argsort(all_keys)
    merged_keys = all_keys[order][:n]
    src_slot = order[:n]  # index into [pool | fresh]
    from_pool = src_slot < n
    pool_idx = jnp.clip(src_slot, 0, n - 1)
    tsdf = jnp.where(from_pool[:, None, None, None], vol.tsdf[pool_idx], 0.0)
    weight = jnp.where(from_pool[:, None, None, None], vol.weight[pool_idx], 0.0)
    active = merged_keys != _EMPTY_KEY
    # unpack coords from keys
    c = merged_keys
    mask_b = (1 << _BITS) - 1
    cz = (c & mask_b) - _OFFSET
    cy = ((c >> _BITS) & mask_b) - _OFFSET
    cx = ((c >> (2 * _BITS)) & mask_b) - _OFFSET
    coords = jnp.stack([cx, cy, cz], axis=-1).astype(jnp.int32)
    return vol._replace(keys=merged_keys, coords=coords, tsdf=tsdf, weight=weight, active=active)


@jax.jit
def integrate(vol: HashTSDF, depth: jnp.ndarray, intr: jnp.ndarray, T_cw: jnp.ndarray, max_weight: float = 64.0, depth_max: float = 4.0) -> HashTSDF:
    """Fuse a depth frame into all active blocks (per-unit integration):
    every voxel of every block projects into the frame (gather), masked by
    block activity — identical math to the dense volume, batched over the
    pool."""
    H, W = depth.shape
    R, t = se3.mat_to_rt(T_cw)

    # voxel world coords: (N, B, B, B, 3)
    off = jnp.stack(
        jnp.meshgrid(jnp.arange(B), jnp.arange(B), jnp.arange(B), indexing="ij"), axis=-1
    ).astype(jnp.float32)
    base = vol.coords.astype(jnp.float32) * B  # (N, 3) in voxels
    pw = (base[:, None, None, None, :] + off[None] + 0.5) * vol.voxel_size

    pc = jnp.einsum("ij,nabcj->nabci", R, pw) + t
    z = pc[..., 2]
    uimg = pc[..., 0] / jnp.maximum(z, 1e-9) * intr[0] + intr[2]
    vimg = pc[..., 1] / jnp.maximum(z, 1e-9) * intr[1] + intr[3]
    ui = jnp.round(uimg).astype(jnp.int32)
    vi = jnp.round(vimg).astype(jnp.int32)
    inb = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    d = depth[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
    ok = inb & (d > 0) & (d < depth_max) & vol.active[:, None, None, None]
    sdf = d - z
    within = ok & (sdf > -vol.trunc_dist)
    tsdf_new = jnp.clip(sdf / vol.trunc_dist, -1.0, 1.0)
    w_old = vol.weight
    w_add = within.astype(jnp.float32)
    fused = jnp.where(
        within,
        (vol.tsdf * w_old + tsdf_new * w_add) / jnp.maximum(w_old + w_add, 1.0),
        vol.tsdf,
    )
    return vol._replace(tsdf=fused, weight=jnp.minimum(w_old + w_add, max_weight))


def sample(vol: HashTSDF, pts_world: jnp.ndarray):
    """Nearest-voxel TSDF sample at world points (..., 3) -> (value, valid)."""
    g = pts_world / vol.voxel_size
    vox = jnp.floor(g).astype(jnp.int32)
    bc = jnp.floor(vox / B).astype(jnp.int32)
    local = vox - bc * B
    keys = _pack(bc)
    slot, found = _lookup(vol.keys, keys)
    lx = jnp.clip(local[..., 0], 0, B - 1)
    ly = jnp.clip(local[..., 1], 0, B - 1)
    lz = jnp.clip(local[..., 2], 0, B - 1)
    val = vol.tsdf[slot, lx, ly, lz]
    wgt = vol.weight[slot, lx, ly, lz]
    return val, found & (wgt > 0)


@partial(jax.jit, static_argnames=("shape", "n_steps"))
def raycast(vol: HashTSDF, intr: jnp.ndarray, T_cw: jnp.ndarray, shape=(120, 160), n_steps: int = 128, depth_min: float = 0.2, depth_max: float = 4.0):
    """Fixed-step march with nearest-voxel sampling + linear zero-crossing
    interpolation. Returns (points_cam, normals_cam, valid)."""
    H, W = shape
    T_wc = se3.inverse(T_cw)
    R_wc, t_wc = se3.mat_to_rt(T_wc)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    dirs_cam = jnp.stack([(u - intr[2]) / intr[0], (v - intr[3]) / intr[1], jnp.ones((H, W))], axis=-1)
    dirs = jnp.einsum("ij,hwj->hwi", R_wc, dirs_cam)
    origin = t_wc
    dz = (depth_max - depth_min) / n_steps

    # sample-all-then-reduce (see tsdf.raycast): one batched lookup of all
    # (step, ray) samples, then a vectorized first-crossing argmax
    zs = depth_min + (jnp.arange(n_steps) + 0.5) * dz
    pts = origin[None, None, None] + dirs[None] * zs[:, None, None, None]
    f, ok = sample(vol, pts)  # (S, H, W)
    f_prev = jnp.concatenate([jnp.ones((1, H, W)), f[:-1]])
    ok_prev = jnp.concatenate([jnp.zeros((1, H, W), bool), ok[:-1]])
    crossing = ok & ok_prev & (f_prev > 0) & (f < 0)
    valid = jnp.any(crossing, axis=0)
    first = jnp.argmax(crossing, axis=0)
    fi = jnp.take_along_axis(f, first[None], axis=0)[0]
    fp = jnp.take_along_axis(f_prev, first[None], axis=0)[0]
    zc = zs[first]
    zp = zs[jnp.maximum(first - 1, 0)]
    denom = fp - fi
    alpha = jnp.where(jnp.abs(denom) > 1e-9, fp / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), 0.0)
    zhit = jnp.where(valid, zp + alpha * (zc - zp), 0.0)
    pts_world = origin[None, None] + dirs * zhit[..., None]

    # normals by central differences of the sampled field
    h = vol.voxel_size
    def grad_axis(e):
        return sample(vol, pts_world + e)[0] - sample(vol, pts_world - e)[0]
    g = jnp.stack([
        grad_axis(jnp.array([1.0, 0, 0]) * h),
        grad_axis(jnp.array([0, 1.0, 0]) * h),
        grad_axis(jnp.array([0, 0, 1.0]) * h),
    ], axis=-1)
    normals_world = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    R_cw, t_cw = se3.mat_to_rt(T_cw)
    pts_cam = jnp.einsum("ij,hwj->hwi", R_cw, pts_world) + t_cw
    normals_cam = jnp.einsum("ij,hwj->hwi", R_cw, normals_world)
    valid = valid & (zhit > 0)
    return pts_cam * valid[..., None], jnp.where(valid[..., None], normals_cam, 0.0), valid


def n_active(vol: HashTSDF) -> int:
    return int(jnp.sum(vol.active))
