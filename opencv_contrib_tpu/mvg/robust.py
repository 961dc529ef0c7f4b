"""Vmapped RANSAC framework.

Parity: libmv's templated robust estimation (libmv/multiview/
robust_estimation.h:73-74 Estimate<Kernel, Scorer>) and the public
fundamentalFromCorrespondences{7,8}PointRobust API (sfm/robust.hpp:65,88).

TPU-first redesign: instead of the reference's sequential hypothesize-score
loop, ALL hypotheses are drawn up front and solved/scored as one batched
computation (vmap over hypotheses x broadcast over points) — a single fused
device program with static shapes. Masked sampling handles padded inputs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # scalar int
    score: jnp.ndarray  # scalar float (inlier count or MSAC score)
    best_index: jnp.ndarray


def sample_indices(key, n_points: int, mask: jnp.ndarray, n_hypotheses: int, sample_size: int):
    """Draw (n_hypotheses, sample_size) distinct valid indices via the
    Gumbel-top-k trick — one batched op, no rejection loop."""
    g = jax.random.gumbel(key, (n_hypotheses, n_points))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


def ransac(
    key,
    solver: Callable,
    scorer: Callable,
    data,
    n_points: int,
    sample_size: int,
    n_hypotheses: int = 256,
    threshold: float = 1e-2,
    mask: jnp.ndarray | None = None,
    msac: bool = True,
):
    """Generic batched RANSAC.

    solver(sample_data...) -> (models (M, ...), model_valid (M,)) for a
        minimal sample (sample_size leading dim on each data array); M is the
        (static) number of models per sample (1 for 8-pt, 3 for 7-pt).
    scorer(model, *data) -> residuals (N,) for all points.
    data: tuple of arrays with leading dim N.
    """
    if mask is None:
        mask = jnp.ones(n_points, bool)
    idx = sample_indices(key, n_points, mask, n_hypotheses, sample_size)

    def solve_one(sample_idx):
        sample = tuple(d[sample_idx] for d in data)
        return solver(*sample)

    models, model_valid = jax.vmap(solve_one)(idx)  # (H, M, ...), (H, M)
    flat_models = jax.tree.map(lambda m: m.reshape((-1,) + m.shape[2:]), models)
    flat_valid = model_valid.reshape(-1)

    def score_one(model):
        res = scorer(model, *data)  # (N,)
        inl = (res < threshold) & mask
        if msac:
            s = jnp.sum(jnp.where(inl, threshold - res, 0.0))
        else:
            s = jnp.sum(inl).astype(jnp.float32)
        return s, jnp.sum(inl)

    scores, counts = jax.vmap(score_one)(flat_models)
    scores = jnp.where(flat_valid, scores, -jnp.inf)
    best = jnp.argmax(scores)
    best_model = jax.tree.map(lambda m: m[best], flat_models)
    res = scorer(best_model, *data)
    inliers = (res < threshold) & mask
    return RansacResult(best_model, inliers, jnp.sum(inliers), scores[best], best)


# ----------------------------------------------------------------------------
# Concrete robust estimators (the reference's public robust API)
# ----------------------------------------------------------------------------


def fundamental_8pt_robust(key, x1, x2, threshold_px: float = 1.0, mask=None, n_hypotheses: int = 256):
    """RANSAC 8-point fundamental (parity:
    cv::sfm::fundamentalFromCorrespondences8PointRobust, robust.hpp:65).
    threshold_px is in pixels on the symmetric epipolar distance."""
    from opencv_contrib_tpu.mvg import fundamental as fmod

    def solver(s1, s2):
        F = fmod.eight_point(s1, s2)
        return F[None], jnp.ones((1,), bool)

    def scorer(F, a1, a2):
        return fmod.epipolar_distance(F, a1, a2)

    return ransac(
        key, solver, scorer, (x1, x2), x1.shape[0], 8,
        n_hypotheses=n_hypotheses, threshold=threshold_px**2, mask=mask,
    )


def fundamental_7pt_robust(key, x1, x2, threshold_px: float = 1.0, mask=None, n_hypotheses: int = 128):
    """RANSAC 7-point fundamental (parity:
    cv::sfm::fundamentalFromCorrespondences7PointRobust, robust.hpp:88)."""
    from opencv_contrib_tpu.mvg import fundamental as fmod

    def solver(s1, s2):
        return fmod.seven_point(s1, s2)

    def scorer(F, a1, a2):
        return fmod.epipolar_distance(F, a1, a2)

    return ransac(
        key, solver, scorer, (x1, x2), x1.shape[0], 7,
        n_hypotheses=n_hypotheses, threshold=threshold_px**2, mask=mask,
    )


def homography_robust(key, x1, x2, threshold_px: float = 2.0, mask=None, n_hypotheses: int = 256):
    from opencv_contrib_tpu.mvg import homography as hmod

    def solver(s1, s2):
        H = hmod.dlt(s1, s2)
        return H[None], jnp.ones((1,), bool)

    def scorer(H, a1, a2):
        return hmod.transfer_error(H, a1, a2)

    return ransac(
        key, solver, scorer, (x1, x2), x1.shape[0], 4,
        n_hypotheses=n_hypotheses, threshold=threshold_px**2, mask=mask,
    )


def pnp_robust(key, X, xn, threshold: float = 0.01, mask=None, n_hypotheses: int = 256):
    """RANSAC PnP on calibrated correspondences (robust EuclideanResect)."""
    from opencv_contrib_tpu.mvg import resection as rmod
    from opencv_contrib_tpu.core import se3 as s3

    def solver(sX, sx):
        R, t = rmod.pnp_dlt(sX, sx)
        Rt = jnp.concatenate([R, t[:, None]], axis=1)
        return Rt[None], jnp.ones((1,), bool)

    def scorer(Rt, aX, ax):
        R, t = Rt[:, :3], Rt[:, 3]
        Xc = s3.rotate_points(R, aX) + t
        z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
        pred = Xc[..., :2] / z[..., None]
        behind = Xc[..., 2] <= 0
        d = jnp.sum((pred - ax) ** 2, axis=-1)
        return jnp.where(behind, jnp.inf, d)

    return ransac(
        key, solver, scorer, (X, xn), X.shape[0], 6,
        n_hypotheses=n_hypotheses, threshold=threshold**2, mask=mask,
    )
