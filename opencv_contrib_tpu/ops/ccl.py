"""Connected-component labeling as iterative min-label propagation.

Parity role: cv::connectedComponents / cuda::connectedComponents
(cudaimgproc/src/cuda/connectedcomponents.cu). The CUDA reference uses a
union-find sweep; on TPU the idiomatic formulation is fixed-point min-pool
label flooding — each pass is one fused 3x3 min stencil, and the pass count
is logarithmic in the longest component path when combined with pointer
jumping via gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.iinfo(jnp.int32).max


def _min_neighbor_pass(labels, mask, connectivity: int):
    H, W = labels.shape
    L = jnp.where(mask, labels, BIG)
    p = jnp.pad(L, 1, constant_values=BIG)
    out = L
    shifts = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if connectivity == 8:
        shifts += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    for dy, dx in shifts:
        out = jnp.minimum(out, p[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W])
    return jnp.where(mask, out, BIG)


@partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def connected_components(mask, connectivity: int = 4, max_iters: int = 64):
    """Label the True pixels of mask. Returns (labels, n_passes) where
    labels is int32, -1 on background, and each component carries the
    minimum raster index of its pixels (stable, order-independent).

    Pointer jumping (labels <- labels[labels]) after each flood pass gives
    effective O(log diameter) convergence."""
    H, W = mask.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels = jnp.where(mask, idx, BIG)

    def body(state):
        labels, i, _ = state
        new = _min_neighbor_pass(labels, mask, connectivity)
        # pointer jumping: follow the label chain one hop
        flat = new.reshape(-1)
        safe = jnp.where(flat == BIG, 0, flat)
        jumped = jnp.where(flat == BIG, BIG, jnp.minimum(flat, flat[safe]))
        new = jumped.reshape(H, W)
        return new, i + 1, jnp.any(new != labels)

    def cond(state):
        _, i, changed = state
        return changed & (i < max_iters)

    labels, n, _ = jax.lax.while_loop(cond, body, (labels, jnp.int32(0), jnp.bool_(True)))
    return jnp.where(mask, labels, -1), n


def component_stats(labels, values=None, max_components: int = 256):
    """Compact per-component stats with static output size: remaps raw
    raster-index labels to [0, max_components) by ranking unique roots.
    Returns dict of (max_components,) arrays: area, y0, x0, y1, x1,
    sum/sumsq of `values` (if given), and valid mask."""
    H, W = labels.shape
    flat = labels.reshape(-1)
    is_fg = flat >= 0
    # rank roots: a pixel is a root representative iff its raster index == label
    idx = jnp.arange(H * W, dtype=jnp.int32)
    is_root = is_fg & (flat == idx)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # root -> compact id
    comp_of_root = jnp.where(is_root, rank, 0)
    # compact id per pixel = rank at its root
    safe = jnp.where(is_fg, flat, 0)
    cid = jnp.where(is_fg, comp_of_root[safe], max_components)
    cid = jnp.minimum(cid, max_components)  # overflow bucket

    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    ones = is_fg.astype(jnp.float32)
    area = jnp.zeros(max_components + 1).at[cid].add(ones)[:max_components]
    y0 = jnp.full(max_components + 1, jnp.inf).at[cid].min(jnp.where(is_fg, yy.reshape(-1), jnp.inf))[:max_components]
    x0 = jnp.full(max_components + 1, jnp.inf).at[cid].min(jnp.where(is_fg, xx.reshape(-1), jnp.inf))[:max_components]
    y1 = jnp.full(max_components + 1, -jnp.inf).at[cid].max(jnp.where(is_fg, yy.reshape(-1), -jnp.inf))[:max_components]
    x1 = jnp.full(max_components + 1, -jnp.inf).at[cid].max(jnp.where(is_fg, xx.reshape(-1), -jnp.inf))[:max_components]
    out = {"area": area, "y0": y0, "x0": x0, "y1": y1, "x1": x1, "valid": area > 0}
    if values is not None:
        v = values.reshape(-1)
        out["sum"] = jnp.zeros(max_components + 1).at[cid].add(jnp.where(is_fg, v, 0.0))[:max_components]
        out["sumsq"] = jnp.zeros(max_components + 1).at[cid].add(jnp.where(is_fg, v * v, 0.0))[:max_components]
    out["cid_map"] = jnp.where(is_fg, cid, -1).reshape(H, W)
    return out
