"""Shape module completion: EMD costs and the affine transformer.

Reference anchors (shape):
- include/opencv2/shape/hist_cost.hpp — EMDHistogramCostExtractor,
  EMDL1HistogramCostExtractor (+ emdL1.cpp, the tree-EMD for histograms)
- include/opencv2/shape/shape_transformer.hpp — AffineTransformer
  (estimateTransformation / applyTransformation / transformCost)

TPU-first: 1D EMD is exactly the L1 distance of CDFs (one cumsum); the
2D/grid EMD-L1 uses the cumulative-sum decomposition along both axes;
general-cost EMD between weighted point sets is Sinkhorn-regularized OT —
fixed-iteration `lax.scan`, all dense matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def emd_1d(h1: jnp.ndarray, h2: jnp.ndarray) -> jnp.ndarray:
    """Exact 1D earth mover's distance between histograms with unit ground
    distance: L1 norm of the CDF difference (after mass normalization)."""
    a = h1 / jnp.maximum(h1.sum(), 1e-12)
    b = h2 / jnp.maximum(h2.sum(), 1e-12)
    return jnp.abs(jnp.cumsum(a - b)).sum()


@partial(jax.jit, static_argnames=("n_iters",))
def emd_l1_grid(h1: jnp.ndarray, h2: jnp.ndarray, reg: float = 0.02,
                n_iters: int = 300) -> jnp.ndarray:
    """EMD-L1 between 2D histograms (parity: cv::EMDL1, emdL1.cpp — the
    shape-context log-polar grids are 2D histograms). The reference solves
    the tree-flow LP; here the L1-ground-metric transport is solved by
    entropic Sinkhorn with a small regularizer — dense (bins x bins)
    matmuls, near-exact for the sharp regularization used."""
    nr, na = h1.shape
    a = (h1 / jnp.maximum(h1.sum(), 1e-12)).reshape(-1)
    b = (h2 / jnp.maximum(h2.sum(), 1e-12)).reshape(-1)
    ys, xs = jnp.mgrid[0:nr, 0:na]
    yf = ys.reshape(-1).astype(jnp.float32)
    xf = xs.reshape(-1).astype(jnp.float32)
    C = jnp.abs(yf[:, None] - yf[None, :]) + jnp.abs(xf[:, None] - xf[None, :])
    scale = jnp.maximum(C.max(), 1e-9)
    K = jnp.exp(-C / (reg * scale))

    def body(uv, _):
        u, v = uv
        u = a / jnp.maximum(K @ v, 1e-30)
        v = b / jnp.maximum(K.T @ u, 1e-30)
        return (u, v), None

    (u, v), _ = jax.lax.scan(body, (jnp.ones_like(a), jnp.ones_like(b)), None,
                             length=n_iters)
    P = u[:, None] * K * v[None, :]
    return (P * C).sum()


@partial(jax.jit, static_argnames=("n_iters",))
def emd_sinkhorn(w1: jnp.ndarray, x1: jnp.ndarray, w2: jnp.ndarray, x2: jnp.ndarray,
                 reg: float = 0.05, n_iters: int = 200) -> jnp.ndarray:
    """General EMD between weighted point sets (parity: cv::EMD with
    DIST_L2 ground metric), via entropic-regularized Sinkhorn iterations —
    dense matmuls + row/col renormalizations, the TPU-native OT solver.
    w: (N,), x: (N, D). Returns the transport cost."""
    a = w1 / jnp.maximum(w1.sum(), 1e-12)
    b = w2 / jnp.maximum(w2.sum(), 1e-12)
    C = jnp.sqrt(jnp.maximum(
        (x1 ** 2).sum(1)[:, None] + (x2 ** 2).sum(1)[None, :] - 2.0 * x1 @ x2.T, 0.0))
    scale = jnp.maximum(C.max(), 1e-9)
    # clamp the Gibbs kernel away from float32 underflow (sharp reg)
    K = jnp.maximum(jnp.exp(-C / (reg * scale)), 1e-30)

    def body(uv, _):
        u, v = uv
        u = a / jnp.maximum(K @ v, 1e-30)
        v = b / jnp.maximum(K.T @ u, 1e-30)
        return (u, v), None

    u0 = jnp.ones_like(a)
    v0 = jnp.ones_like(b)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=n_iters)
    P = u[:, None] * K * v[None, :]
    return (P * C).sum()


def emd_histogram_cost(descs1: jnp.ndarray, descs2: jnp.ndarray,
                       grid_shape=None) -> jnp.ndarray:
    """Pairwise EMD-L1 cost matrix between two stacks of histograms
    (parity: EMDL1HistogramCostExtractor::buildCostMatrix). descs: (N, D)
    flattened histograms; grid_shape optionally reinterprets D as 2D."""
    if grid_shape is None:
        fn = jax.vmap(jax.vmap(emd_1d, (None, 0)), (0, None))
        return fn(descs1, descs2)
    nr, na = grid_shape
    d1 = descs1.reshape(-1, nr, na)
    d2 = descs2.reshape(-1, nr, na)
    fn = jax.vmap(jax.vmap(emd_l1_grid, (None, 0)), (0, None))
    return fn(d1, d2)


# ---------------------------------------------------------------------------
# Affine transformer
# ---------------------------------------------------------------------------


@jax.jit
def affine_fit(src: jnp.ndarray, dst: jnp.ndarray, full_affine: bool = True):
    """Estimate the 2x3 affine mapping src -> dst from correspondences
    (parity: cv::AffineTransformer::estimateTransformation). With
    full_affine=False restricts to similarity (scale+rotation+translation),
    matched to estimateRigidTransform(false)."""
    N = src.shape[0]
    ones = jnp.ones((N, 1), src.dtype)
    A = jnp.concatenate([src, ones], 1)  # (N, 3)
    sol = jnp.linalg.lstsq(A, dst)[0]  # (3, 2)
    M_full = sol.T  # (2, 3)

    # similarity-constrained closed form (Umeyama without reflection)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    a = (sc * dc).sum() / jnp.maximum((sc ** 2).sum(), 1e-12)
    bnum = (sc[:, 0] * dc[:, 1] - sc[:, 1] * dc[:, 0]).sum()
    b = bnum / jnp.maximum((sc ** 2).sum(), 1e-12)
    R = jnp.array([[a, -b], [b, a]])
    t = mu_d - R @ mu_s
    M_sim = jnp.concatenate([R, t[:, None]], 1)
    return jnp.where(full_affine, M_full, M_sim)


@jax.jit
def affine_apply(M: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 2x3 affine to (N, 2) points (applyTransformation)."""
    return pts @ M[:, :2].T + M[:, 2]


@jax.jit
def affine_transform_cost(M: jnp.ndarray) -> jnp.ndarray:
    """Bending-energy-style cost of an affine map (transformCost): the
    deviation of the linear part from a pure rotation+uniform scale."""
    A = M[:, :2]
    s = jnp.sqrt(jnp.maximum(jnp.abs(jnp.linalg.det(A)), 1e-12))
    E = A / s
    return jnp.linalg.norm(E @ E.T - jnp.eye(2)) + jnp.abs(jnp.log(s))
