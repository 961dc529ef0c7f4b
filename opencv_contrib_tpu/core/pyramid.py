"""Gaussian / depth image pyramids — coarse-to-fine substrate.

Reference capability: cv::pyrDown chains, KinFu's pyrDownBilateral +
pyrDownPointsNormals (rgbd/src/kinfu_frame.cpp:163,255), ICP/odometry
multiscale loops (fast_icp.cpp:101, odometry.cpp:851).

Pyramids are Python tuples of arrays (shapes halve per level — a static
structure under jit as long as the level count is static).
"""

from __future__ import annotations

import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters


PYR_KERNEL = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Gaussian 5-tap blur + 2x decimation (cv::pyrDown semantics)."""
    blurred = filters.sep_filter2d(img, PYR_KERNEL, PYR_KERNEL)
    return blurred[::2, ::2]


def pyr_up(img: jnp.ndarray) -> jnp.ndarray:
    """2x zero-stuffed upsample + 5-tap blur (cv::pyrUp semantics)."""
    H, W = img.shape[:2]
    up = jnp.zeros((2 * H, 2 * W) + img.shape[2:], img.dtype)
    up = up.at[::2, ::2].set(img)
    return filters.sep_filter2d(up, PYR_KERNEL * 2.0, PYR_KERNEL * 2.0)


def build_pyramid(img: jnp.ndarray, levels: int):
    """[full-res, half, quarter, ...] — `levels` entries."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return tuple(pyr)


def pyr_down_depth(depth: jnp.ndarray, sigma_depth: float = 0.02) -> jnp.ndarray:
    """Depth-aware half-resolution downsample: average the 2x2 block but only
    over pixels close to the block's reference depth, and keep zeros invalid
    (KinFu's pyrDownBilateral, kinfu_frame.cpp:255)."""
    H2, W2 = depth.shape[0] // 2, depth.shape[1] // 2
    blocks = depth[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2).transpose(0, 2, 1, 3).reshape(H2, W2, 4)
    ref = blocks[..., 0]
    valid = (blocks > 0) & (jnp.abs(blocks - ref[..., None]) < 3.0 * sigma_depth)
    cnt = jnp.sum(valid, axis=-1)
    s = jnp.sum(jnp.where(valid, blocks, 0.0), axis=-1)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 0.0)


def build_depth_pyramid(depth: jnp.ndarray, levels: int, sigma_depth: float = 0.02):
    pyr = [depth]
    for _ in range(levels - 1):
        pyr.append(pyr_down_depth(pyr[-1], sigma_depth))
    return tuple(pyr)
