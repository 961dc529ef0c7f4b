"""HFS segmentation stages (hfs/src/hfs_core.cpp semantics)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ximgproc.slic import slic


@partial(jax.jit, static_argnames=("n_regions",))
def region_features(img, labels, n_regions: int):
    """Per-superpixel mean color and size via segment-sum (the device half
    of the reference's feature extraction)."""
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    flat = labels.reshape(-1)
    cnt = jnp.zeros(n_regions).at[flat].add(1.0)
    mean = jnp.zeros((n_regions, C)).at[flat].add(img.reshape(-1, C)) / jnp.maximum(cnt, 1)[:, None]
    return mean, cnt


@partial(jax.jit, static_argnames=("n_regions",))
def region_adjacency(img, labels, n_regions: int):
    """Boundary-weighted adjacency: for each horizontally/vertically
    adjacent label pair, accumulate boundary length and mean gradient
    magnitude along the shared boundary. Returns dense (R, R) matrices
    (len, grad_sum) — superpixel counts are small so dense is TPU-friendly."""
    g = img if img.ndim == 2 else img.mean(-1)
    gy, gx = filters.gradients(g)
    mag = jnp.sqrt(gy * gy + gx * gx)

    def acc(a, b, m):
        pair = a * n_regions + b
        length = jnp.zeros(n_regions * n_regions).at[pair.reshape(-1)].add(
            (a != b).reshape(-1).astype(jnp.float32))
        gsum = jnp.zeros(n_regions * n_regions).at[pair.reshape(-1)].add(
            jnp.where(a != b, m, 0.0).reshape(-1))
        return length, gsum

    l1, g1 = acc(labels[:, :-1], labels[:, 1:], 0.5 * (mag[:, :-1] + mag[:, 1:]))
    l2, g2 = acc(labels[:-1, :], labels[1:, :], 0.5 * (mag[:-1, :] + mag[1:, :]))
    L = (l1 + l2).reshape(n_regions, n_regions)
    G = (g1 + g2).reshape(n_regions, n_regions)
    L = L + L.T
    G = G + G.T
    return L, G


def _merge(edges, weights, sizes, n, threshold: float):
    """Felzenszwalb merge on the region graph: join components when the
    edge weight is below min(internal + k/size) of both sides (host
    union-find, as in the reference's CPU merge stage)."""
    parent = np.arange(n)
    internal = np.zeros(n)
    size = sizes.copy()

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    order = np.argsort(weights)
    for ei in order:
        a, b = edges[ei]
        w = weights[ei]
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        ta = internal[ra] + threshold / max(size[ra], 1)
        tb = internal[rb] + threshold / max(size[rb], 1)
        if w <= min(ta, tb):
            parent[rb] = ra
            size[ra] += size[rb]
            internal[ra] = max(internal[ra], internal[rb], w)
    roots = np.array([find(i) for i in range(n)])
    _, remap = np.unique(roots, return_inverse=True)
    return remap


def hfs_segment(img, grid: int = 12, seg_thresh1: float = 0.1, seg_thresh2: float = 0.3,
                w_color: float = 1.0, w_grad: float = 0.5, slic_iters: int = 6):
    """Two-stage HFS segmentation (HfsSegment::performSegment*):
    stage 1 merges superpixels by color+boundary-gradient affinity; stage 2
    re-merges the stage-1 regions with a looser threshold. Returns an
    (H, W) int32 segment map."""
    img = jnp.asarray(img, jnp.float32)
    labels, _ = slic(img, grid=grid, n_iters=slic_iters)
    n = grid * grid
    mean, cnt = region_features(img, labels, n)
    L, G = region_adjacency(img, labels, n)

    Lnp, Gnp = np.asarray(L), np.asarray(G)
    meann, cntn = np.asarray(mean), np.asarray(cnt)
    ii, jj = np.nonzero(np.triu(Lnp, 1))
    if ii.size == 0:
        return np.asarray(labels)
    color_d = np.linalg.norm(meann[ii] - meann[jj], axis=1)
    grad_d = Gnp[ii, jj] / np.maximum(Lnp[ii, jj], 1)
    w = w_color * color_d + w_grad * grad_d

    edges = np.stack([ii, jj], axis=1)
    # Felzenszwalb's tau = k/|C| uses REGION counts here (superpixels are
    # the graph nodes), not pixel counts — pixel sizes would make tau
    # vanish on any realistic image
    remap1 = _merge(edges, w, np.ones(n), n, seg_thresh1)
    # stage 2 on the coarsened graph
    n2 = remap1.max() + 1
    s2 = np.zeros(n2)
    for r in range(n):
        s2[remap1[r]] += 1.0
    e2w = {}
    for (a, b), ww in zip(edges, w):
        ra, rb = remap1[a], remap1[b]
        if ra == rb:
            continue
        k = (min(ra, rb), max(ra, rb))
        e2w[k] = min(e2w.get(k, np.inf), ww)
    if e2w:
        e2 = np.array(list(e2w.keys()))
        w2 = np.array(list(e2w.values()))
        remap2 = _merge(e2, w2, s2, n2, seg_thresh2)
    else:
        remap2 = np.arange(n2)
    final = remap2[remap1]
    return final[np.asarray(labels)]
