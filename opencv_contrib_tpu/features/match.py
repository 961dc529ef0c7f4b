"""Brute-force descriptor matching as batched matmul + top-k, with ratio
test, cross-check, and GMS filtering.

Parity: cuda::DescriptorMatcher BF match/knnMatch (reference:
cudafeatures2d.hpp:92, kernels cudafeatures2d/src/cuda/bf_match.cu:59-113 —
block-tiled distance + shared-mem argmin) and xfeatures2d matchGMS
(gms.cpp; header xfeatures2d.hpp:1256).

TPU-first: the distance matrix IS a matmul —
  L2²(q, t) = |q|² + |t|² - 2 q·t        (float descriptors)
  Hamming(q, t) = (D - q·t) / 2          (±1-encoded binary descriptors)
so the MXU does all the work and `jax.lax.top_k` replaces the argmin tree.
Invalid (padded) rows are masked to +inf distance.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Matches(NamedTuple):
    query_idx: jnp.ndarray  # (M,) int32
    train_idx: jnp.ndarray  # (M,) int32
    distance: jnp.ndarray  # (M,) float32
    valid: jnp.ndarray  # (M,) bool


def l2_distance_matrix(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances (Q, T) via one matmul."""
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    tn = jnp.sum(t * t, axis=-1)
    return qn + tn[None, :] - 2.0 * jnp.dot(q, t.T, preferred_element_type=jnp.float32)


def hamming_distance_matrix(q_signs: jnp.ndarray, t_signs: jnp.ndarray) -> jnp.ndarray:
    """Hamming distances from ±1 encodings: (D - q.t)/2 — pure MXU work."""
    D = q_signs.shape[-1]
    return 0.5 * (D - jnp.dot(q_signs, t_signs.T, preferred_element_type=jnp.float32))


@partial(jax.jit, static_argnames=("metric",))
def knn2(
    q: jnp.ndarray,
    t: jnp.ndarray,
    q_valid: jnp.ndarray | None = None,
    t_valid: jnp.ndarray | None = None,
    metric: str = "l2",
):
    """2-NN search: returns (dists (Q, 2), idx (Q, 2)) — the knnMatch(k=2)
    everything in the reference's matching front-ends uses
    (feature_matching.cc:96)."""
    d = l2_distance_matrix(q, t) if metric == "l2" else hamming_distance_matrix(q, t)
    if t_valid is not None:
        d = jnp.where(t_valid[None, :], d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, 2)
    dist = -neg
    if q_valid is not None:
        dist = jnp.where(q_valid[:, None], dist, jnp.inf)
    return dist, idx


@partial(jax.jit, static_argnames=("metric", "cross_check"))
def ratio_test_match(
    q: jnp.ndarray,
    t: jnp.ndarray,
    q_valid: jnp.ndarray | None = None,
    t_valid: jnp.ndarray | None = None,
    ratio: float = 0.8,
    metric: str = "l2",
    cross_check: bool = True,
) -> Matches:
    """Lowe ratio-test matching with optional mutual cross-check — the
    FindCandidateMatches contract (feature_matching.cc:96,132). Returns a
    fixed-capacity Matches (one slot per query row)."""
    Q = q.shape[0]
    if q_valid is None:
        q_valid = jnp.ones(Q, bool)
    if t_valid is None:
        t_valid = jnp.ones(t.shape[0], bool)

    d = l2_distance_matrix(q, t) if metric == "l2" else hamming_distance_matrix(q, t)
    d = jnp.where(t_valid[None, :], d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, 2)
    best, second = -neg[:, 0], -neg[:, 1]
    nn = idx[:, 0]
    ok = q_valid & (best < ratio * ratio * second) & jnp.isfinite(best)
    # note: ratio applies to squared L2 -> ratio^2; for hamming use plain ratio
    if metric != "l2":
        ok = q_valid & (best < ratio * second) & jnp.isfinite(best)
    if cross_check:
        dT = jnp.where(q_valid[:, None], d, jnp.inf)
        back = jnp.argmin(dT, axis=0)  # for each train, best query
        ok = ok & (back[nn] == jnp.arange(Q))
    return Matches(
        query_idx=jnp.arange(Q, dtype=jnp.int32),
        train_idx=nn.astype(jnp.int32),
        distance=best,
        valid=ok,
    )


@partial(jax.jit, static_argnames=("grid", "shape1", "shape2"))
def gms_filter(
    matches: Matches,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    shape1=(480, 640),
    shape2=(480, 640),
    grid: int = 20,
    tau_factor: float = 6.0,
) -> Matches:
    """Grid Motion Statistics match filtering (parity: cv::xfeatures2d::matchGMS,
    gms.cpp): matches whose cell->cell motion is supported by many neighbors
    are kept. One-hot cell assignment + a (G², G²) vote matrix via scatter-add;
    thresholded at tau * sqrt(mean support)."""
    H1, W1 = shape1
    H2, W2 = shape2
    G = grid

    def cell_of(xy, H, W):
        cx = jnp.clip((xy[:, 0] / W * G).astype(jnp.int32), 0, G - 1)
        cy = jnp.clip((xy[:, 1] / H * G).astype(jnp.int32), 0, G - 1)
        return cy * G + cx

    c1 = cell_of(xy1[matches.query_idx], H1, W1)
    c2 = cell_of(xy2[matches.train_idx], H2, W2)
    w = matches.valid.astype(jnp.float32)
    votes = jnp.zeros((G * G, G * G), jnp.float32).at[c1, c2].add(w)
    votes4 = votes.reshape(G, G, G, G)
    n_cell = jnp.zeros((G * G,), jnp.float32).at[c1].add(w).reshape(G, G)
    # 3x3 neighborhood aggregation with the SAME offset applied to source and
    # target cells (the GMS kernelized score): coherent motion accumulates,
    # random matches don't.
    supp4 = jnp.zeros_like(votes4)
    n_nb = jnp.zeros_like(n_cell)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            supp4 = supp4 + jnp.roll(votes4, (dy, dx, dy, dx), axis=(0, 1, 2, 3))
            n_nb = n_nb + jnp.roll(n_cell, (dy, dx), axis=(0, 1))
    c1y, c1x = c1 // G, c1 % G
    c2y, c2x = c2 // G, c2 % G
    support = supp4[c1y, c1x, c2y, c2x]
    tau = tau_factor * jnp.sqrt(jnp.maximum(n_nb[c1y, c1x], 1.0) / 9.0)
    keep = matches.valid & (support > tau)
    return matches._replace(valid=keep)


def match_pairs_batched(descs: jnp.ndarray, valids: jnp.ndarray, pairs: jnp.ndarray, ratio: float = 0.8):
    """Match many image pairs in one vmap: descs (N, K, D), valids (N, K),
    pairs (Np, 2) index pairs -> Matches with leading dim Np. The batched
    form of the all-pairs cross-matching sweep (nRobustViewMatching.cc:154)."""

    def one(pair):
        i, j = pair[0], pair[1]
        return ratio_test_match(descs[i], descs[j], valids[i], valids[j], ratio=ratio)

    return jax.vmap(one)(pairs)


@partial(jax.jit, static_argnames=("k", "min_support"))
def logos_filter(
    matches: Matches,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    k: int = 5,
    min_support: int = 2,
    pos_tol: float = 0.25,
):
    """LOGOS-style local geometric support verification (matchLOGOS,
    xfeatures2d.hpp:1271, logos/ lib): a tentative match survives when at
    least `min_support` of its k nearest neighbors in image 1 map to
    points whose RELATIVE displacement in image 2 matches the relative
    displacement in image 1 (scale-normalized within pos_tol).

    Batched: the kNN graph is one distance matrix + top_k; the support
    test is a (Q, k) tensor expression.
    """
    Q = xy1.shape[0]
    d1 = ((xy1[:, None] - xy1[None]) ** 2).sum(-1)
    # mask self and invalid columns with where (adding eye*inf would put
    # 0*inf = NaN off-diagonal and poison the whole kNN graph)
    exclude = jnp.eye(Q, dtype=bool) | ~matches.valid[None]
    d1 = jnp.where(exclude, jnp.inf, d1)
    _, nbr = jax.lax.top_k(-d1, k)  # (Q, k) neighbor indices in image 1

    p2 = xy2[matches.train_idx]  # (Q, 2) matched positions in image 2
    rel1 = xy1[nbr] - xy1[:, None]  # (Q, k, 2)
    rel2 = p2[nbr] - p2[:, None]
    # Per-neighbor local SIMILARITY estimate as a complex ratio
    # z2/z1 = (scale, rotation): invariant to local rotation + scale, so
    # pure-rotation scenes of true inliers keep full support. A neighbor
    # supports the match when its ratio agrees with the per-query median.
    n1sq = jnp.maximum((rel1 * rel1).sum(-1), 1e-12)
    re = (rel2[..., 0] * rel1[..., 0] + rel2[..., 1] * rel1[..., 1]) / n1sq
    im = (rel2[..., 1] * rel1[..., 0] - rel2[..., 0] * rel1[..., 1]) / n1sq
    med_re = jnp.median(re, axis=1)  # (Q,)
    med_im = jnp.median(im, axis=1)
    med_mag = jnp.maximum(jnp.sqrt(med_re**2 + med_im**2), 1e-6)
    # A neighbor supports the match only when the pair ratio agrees with
    # BOTH endpoints' local medians: a corrupted query inflates its own
    # median (making a query-only test vacuous), but its neighbors'
    # medians stay honest and reject it.
    dev_q = jnp.sqrt((re - med_re[:, None]) ** 2 + (im - med_im[:, None]) ** 2)
    dev_n = jnp.sqrt((re - med_re[nbr]) ** 2 + (im - med_im[nbr]) ** 2)
    consistent = (
        matches.valid[nbr]
        & (dev_q < pos_tol * med_mag[:, None])
        & (dev_n < pos_tol * med_mag[nbr])
    )
    support = consistent.sum(1)
    ok = matches.valid & (support >= min_support)
    return matches._replace(valid=ok)


def gms_filter_auto(matches: Matches, xy1, xy2, shape1=(480, 640), shape2=(480, 640),
                    tau_factor: float = 6.0):
    """GMS with the grid size derived from match density (the reference's
    setNumberOfPoints-style adaptation): G ~ sqrt(n_matches / 4), clamped
    to [8, 32], so each cell holds ~4 matches on average."""
    n = int(np.asarray(jnp.sum(matches.valid)))
    grid = int(np.clip(int(np.sqrt(max(n, 1) / 4.0)), 8, 32))
    return gms_filter(matches, xy1, xy2, shape1=shape1, shape2=shape2,
                      grid=grid, tau_factor=tau_factor)
