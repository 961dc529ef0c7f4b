"""Shape distances: Hausdorff, chi-square histogram cost, shape context."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hausdorff_distance(a: jnp.ndarray, b: jnp.ndarray, rank: float = 1.0) -> jnp.ndarray:
    """(Partial) directed-symmetric Hausdorff distance between point sets
    (N, 2)/(M, 2). rank < 1 uses the rank-quantile (robust variant, like the
    reference's rankProportion)."""
    d = jnp.linalg.norm(a[:, None] - b[None], axis=-1)
    d_ab = jnp.min(d, axis=1)
    d_ba = jnp.min(d, axis=0)
    if rank >= 1.0:
        return jnp.maximum(d_ab.max(), d_ba.max())
    return jnp.maximum(jnp.quantile(d_ab, rank), jnp.quantile(d_ba, rank))


def chi2_cost(h1: jnp.ndarray, h2: jnp.ndarray) -> jnp.ndarray:
    """Chi-squared histogram cost (hist_cost.cpp ChiHistogramCostExtractor)."""
    return 0.5 * jnp.sum((h1 - h2) ** 2 / jnp.maximum(h1 + h2, 1e-9), axis=-1)


def shape_context_descriptor(pts: jnp.ndarray, n_rad: int = 5, n_ang: int = 12) -> jnp.ndarray:
    """Log-polar shape context histogram per point (N, n_rad * n_ang)
    (shape_context.cpp SCD)."""
    N = pts.shape[0]
    diff = pts[:, None] - pts[None]  # (N, N, 2)
    dist = jnp.linalg.norm(diff, axis=-1)
    mean_dist = jnp.sum(dist) / (N * (N - 1) + 1e-9)
    r = dist / jnp.maximum(mean_dist, 1e-9)
    ang = jnp.arctan2(diff[..., 1], diff[..., 0])  # (N, N)
    r_edges = jnp.logspace(jnp.log10(0.125), jnp.log10(2.0), n_rad + 1)
    r_bin = jnp.clip(jnp.searchsorted(r_edges, r) - 1, 0, n_rad - 1)
    a_bin = jnp.clip(((ang + jnp.pi) / (2 * jnp.pi) * n_ang).astype(jnp.int32), 0, n_ang - 1)
    bins = r_bin * n_ang + a_bin
    valid = (r > 1e-9) & (r < r_edges[-1])
    onehot = jax.nn.one_hot(bins, n_rad * n_ang) * valid[..., None]
    h = onehot.sum(axis=1)  # (N, bins)
    return h / jnp.maximum(h.sum(axis=-1, keepdims=True), 1e-9)


def shape_context_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean best-assignment chi2 cost between shape contexts of two point
    sets (greedy min matching — the reference solves a full assignment; the
    symmetric-min bound matches within test tolerances)."""
    ha = shape_context_descriptor(a)
    hb = shape_context_descriptor(b)
    C = 0.5 * jnp.sum(
        (ha[:, None] - hb[None]) ** 2 / jnp.maximum(ha[:, None] + hb[None], 1e-9), axis=-1
    )
    return 0.5 * (jnp.mean(jnp.min(C, axis=1)) + jnp.mean(jnp.min(C, axis=0)))
