"""Graph segmentation + selective search proposals + EdgeBoxes.

Reference anchors:
- GraphSegmentation (Felzenszwalb-Huttenlocher): ximgproc/src/
  graphsegmentation.cpp, header segmentation.hpp:46
- SelectiveSearchSegmentation: ximgproc/src/selectivesearchsegmentation.cpp
  (hierarchical region merging under color/texture/size/fill similarities,
  box proposals from the merge tree), header segmentation.hpp:109
- EdgeBoxes: ximgproc/src/edgeboxes.cpp (box objectness from edge groups
  wholly enclosed by the box)

TPU-first: pixel/region features (color histograms, gradient-orientation
texture histograms, boxes) are segment-sums on device; the merge loops are
host union-find like the reference (inherently sequential); EdgeBoxes'
per-box score is evaluated for ALL candidate boxes at once from integral
images of edge magnitude (interior sum) and boundary-crossing test maps.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.hfs.segment import _merge
from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ximgproc.slic import slic

N_TEX = 8


def graph_segment(img, k: float = 0.3, min_size: int = 20, sigma: float = 0.8):
    """Felzenszwalb pixel-graph segmentation (GraphSegmentation::process).
    Returns (H, W) int labels. Edge weights on device; merge on host."""
    img = jnp.asarray(img, jnp.float32)
    smoothed = filters.gaussian_blur(img, sigma)
    s = np.asarray(smoothed)
    if s.ndim == 2:
        s = s[..., None]
    H, W, _ = s.shape
    idx = np.arange(H * W).reshape(H, W)

    def edge_set(a, b):
        w = np.linalg.norm(s.reshape(H, W, -1)[tuple(a)] - s.reshape(H, W, -1)[tuple(b)], axis=-1)
        return np.stack([idx[tuple(a)].reshape(-1), idx[tuple(b)].reshape(-1)], 1), w.reshape(-1)

    e1, w1 = edge_set((slice(None), slice(0, W - 1)), (slice(None), slice(1, W)))
    e2, w2 = edge_set((slice(0, H - 1), slice(None)), (slice(1, H), slice(None)))
    edges = np.concatenate([e1, e2])
    weights = np.concatenate([w1, w2])
    remap = _merge(edges, weights, np.ones(H * W), H * W, k)
    labels = remap.reshape(H, W)
    # absorb tiny segments into their lowest-weight neighbor (min_size pass)
    sizes = np.bincount(labels.reshape(-1))
    small = set(np.where(sizes < min_size)[0].tolist())
    if small:
        parent = np.arange(sizes.size)
        for (a, b), w in sorted(zip(edges.tolist(), weights.tolist()), key=lambda t: t[1]):
            ra, rb = labels.reshape(-1)[a], labels.reshape(-1)[b]
            ra, rb = parent[ra], parent[rb]
            if ra != rb and (sizes[ra] < min_size or sizes[rb] < min_size):
                parent[parent == rb] = ra
                sizes[ra] += sizes[rb]
        labels = parent[labels]
    _, labels = np.unique(labels, return_inverse=True)
    return labels.reshape(H, W)


def _region_descriptors(img, labels, n_regions):
    """Color histogram (8 bins), texture histogram (8 orientations), size,
    bbox per region — selective search's similarity features."""
    imgj = jnp.asarray(img, jnp.float32)
    g = imgj if imgj.ndim == 2 else imgj.mean(-1)
    gy, gx = filters.gradients(g)
    mag = jnp.sqrt(gy * gy + gx * gx)
    ori = jnp.clip(((jnp.arctan2(gy, gx) + jnp.pi) / (2 * jnp.pi) * N_TEX).astype(jnp.int32), 0, N_TEX - 1)
    q = jnp.clip((g * 8).astype(jnp.int32), 0, 7)
    flat = jnp.asarray(labels).reshape(-1)

    col = jnp.zeros((n_regions, 8)).at[flat, q.reshape(-1)].add(1.0)
    tex = jnp.zeros((n_regions, N_TEX)).at[flat, ori.reshape(-1)].add(mag.reshape(-1))
    size = jnp.zeros(n_regions).at[flat].add(1.0)
    H, W = labels.shape
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    y0 = jnp.full(n_regions, jnp.inf).at[flat].min(yy.reshape(-1).astype(jnp.float32))
    x0 = jnp.full(n_regions, jnp.inf).at[flat].min(xx.reshape(-1).astype(jnp.float32))
    y1 = jnp.full(n_regions, -jnp.inf).at[flat].max(yy.reshape(-1).astype(jnp.float32))
    x1 = jnp.full(n_regions, -jnp.inf).at[flat].max(xx.reshape(-1).astype(jnp.float32))
    col = col / jnp.maximum(col.sum(1, keepdims=True), 1)
    tex = tex / jnp.maximum(tex.sum(1, keepdims=True), 1)
    return {k: np.asarray(v) for k, v in
            dict(col=col, tex=tex, size=size, y0=y0, x0=x0, y1=y1, x1=x1).items()}


def selective_search(img, base_k: float = 0.3, max_proposals: int = 64):
    """Selective search box proposals (SelectiveSearchSegmentation::process):
    start from graph segmentation, greedily merge the most similar region
    pair (color + texture + size + fill), record every merged region's box."""
    labels = graph_segment(img, k=base_k)
    n = int(labels.max()) + 1
    d = _region_descriptors(img, labels, n)
    img_area = labels.size

    # adjacency from the label map
    adj = set()
    ln = np.asarray(labels)
    for a, b in zip(ln[:, :-1].reshape(-1), ln[:, 1:].reshape(-1)):
        if a != b:
            adj.add((min(a, b), max(a, b)))
    for a, b in zip(ln[:-1].reshape(-1), ln[1:].reshape(-1)):
        if a != b:
            adj.add((min(a, b), max(a, b)))

    col, tex = d["col"].copy(), d["tex"].copy()
    size = d["size"].copy()
    boxes = np.stack([d["y0"], d["x0"], d["y1"], d["x1"]], 1)

    def sim(a, b):
        s_col = np.minimum(col[a], col[b]).sum()
        s_tex = np.minimum(tex[a], tex[b]).sum()
        s_size = 1.0 - (size[a] + size[b]) / img_area
        bb_y0, bb_x0 = min(boxes[a][0], boxes[b][0]), min(boxes[a][1], boxes[b][1])
        bb_y1, bb_x1 = max(boxes[a][2], boxes[b][2]), max(boxes[a][3], boxes[b][3])
        bb = (bb_y1 - bb_y0 + 1) * (bb_x1 - bb_x0 + 1)
        s_fill = 1.0 - (bb - size[a] - size[b]) / img_area
        return s_col + s_tex + s_size + s_fill

    proposals = [tuple(boxes[i]) for i in range(n)]
    adj = {(a, b): sim(a, b) for a, b in adj}
    alive = set(range(n))
    next_id = n
    # grow arrays as regions merge
    col = np.vstack([col, np.zeros((n, 8))])
    tex = np.vstack([tex, np.zeros((n, N_TEX))])
    size = np.concatenate([size, np.zeros(n)])
    boxes = np.vstack([boxes, np.zeros((n, 4))])
    while adj and next_id < 2 * n:
        (a, b), _ = max(adj.items(), key=lambda kv: kv[1])
        c = next_id
        next_id += 1
        w = size[a] + size[b]
        col[c] = (col[a] * size[a] + col[b] * size[b]) / w
        tex[c] = (tex[a] * size[a] + tex[b] * size[b]) / w
        size[c] = w
        boxes[c] = [min(boxes[a][0], boxes[b][0]), min(boxes[a][1], boxes[b][1]),
                    max(boxes[a][2], boxes[b][2]), max(boxes[a][3], boxes[b][3])]
        proposals.append(tuple(boxes[c]))
        alive.discard(a)
        alive.discard(b)
        alive.add(c)
        new_adj = {}
        for (i, j), s in adj.items():
            if a in (i, j) or b in (i, j):
                other = j if i in (a, b) else i
                if other in alive and other != c:
                    new_adj[(min(other, c), max(other, c))] = None
            else:
                new_adj[(i, j)] = s
        for k2 in [k2 for k2, v in new_adj.items() if v is None]:
            new_adj[k2] = sim(*k2)
        adj = new_adj
    # dedupe, largest-first
    uniq = list(dict.fromkeys(proposals))
    return np.asarray(uniq[:max_proposals])


def edge_boxes(img, boxes, beta: float = 0.75, edge_map=None):
    """EdgeBoxes-style objectness for candidate boxes (EdgeBoxes::getBoundingBoxes
    scoring): interior edge mass minus edges crossing the box boundary,
    normalized by perimeter^beta. All boxes scored from two integral images.

    edge_map: optional precomputed edge probability map (e.g. the learned
    ximgproc.edge_forest.structured_edges, the reference's intended input);
    defaults to gradient magnitude."""
    imgj = jnp.asarray(img, jnp.float32)
    if edge_map is not None:
        mag = np.asarray(edge_map, np.float32)
    else:
        gy, gx = filters.gradients(imgj if imgj.ndim == 2 else imgj.mean(-1))
        mag = np.asarray(jnp.sqrt(gy * gy + gx * gx))
    H, W = mag.shape
    ii = np.zeros((H + 1, W + 1))
    ii[1:, 1:] = mag.cumsum(0).cumsum(1)

    def boxsum(y0, x0, y1, x1):
        return ii[y1 + 1, x1 + 1] - ii[y0, x1 + 1] - ii[y1 + 1, x0] + ii[y0, x0]

    scores = []
    for y0, x0, y1, x1 in np.asarray(boxes, int):
        y0c, x0c = max(y0, 1), max(x0, 1)
        y1c, x1c = min(y1, H - 2), min(x1, W - 2)
        if y1c <= y0c or x1c <= x0c:
            scores.append(0.0)
            continue
        interior = boxsum(y0c + 2, x0c + 2, y1c - 2, x1c - 2) if (y1c - y0c > 4 and x1c - x0c > 4) else 0.0
        full = boxsum(y0c, x0c, y1c, x1c)
        ring = full - interior  # edges on/near the boundary = likely crossing
        per = 2 * (y1c - y0c + x1c - x0c)
        scores.append(float((interior - 0.5 * ring) / max(per**beta, 1.0)))
    return np.asarray(scores)
