"""Random-pattern calibration: corner finder via feature matching.

Reference anchor: ccalib/src/randpattern.cpp (RandomPatternCornerFinder:
SIFT-match the captured image against the known random pattern, RANSAC a
homography, keep inliers as 2D-3D correspondences; RandomPatternGenerator
renders the pattern). multicalib.cpp consumes these per-camera
correspondences.

TPU-first: the feature front-end is the existing batched Fast-Hessian/
SURF pipeline; homography RANSAC is the vmapped hypothesis sweep.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.features import describe, detect, match
from opencv_contrib_tpu.mvg.robust import homography_robust


def generate_pattern(shape=(160, 200), seed: int = 7, sigma: float = 1.2):
    """RandomPatternGenerator: smoothed binary noise pattern."""
    from opencv_contrib_tpu.ops import filters

    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 1, shape) > 0.5).astype(np.float32)
    return np.asarray(filters.gaussian_blur(jnp.asarray(img), sigma))


def find_correspondences(pattern, img, pattern_size_m=(0.16, 0.20),
                         max_keypoints: int = 512, ratio: float = 0.85,
                         inlier_px: float = 3.0, key=None):
    """Match image -> pattern and return (obj_pts (N, 3) meters on z=0,
    img_pts (N, 2) pixels, n_inliers) — the CornerFinder::computeObjectImagePointsForSingle
    contract."""
    if key is None:
        key = jax.random.PRNGKey(0)
    pat = jnp.asarray(pattern, jnp.float32)
    im = jnp.asarray(img, jnp.float32)
    k1 = detect.harris(pat, max_keypoints=max_keypoints)
    k2 = detect.harris(im, max_keypoints=max_keypoints)
    d1 = describe.surf_describe(pat, k1)
    d2 = describe.surf_describe(im, k2)
    m = match.ratio_test_match(d2, d1, k2.valid, k1.valid, ratio=ratio)
    xy_img = jnp.stack([k2.x, k2.y], 1)
    xy_pat = jnp.stack([k1.x, k1.y], 1)[m.train_idx]

    res = homography_robust(key, xy_img, xy_pat, threshold_px=inlier_px,
                            mask=m.valid, n_hypotheses=128)
    inl = np.asarray(res.inliers & m.valid)
    sy = pattern_size_m[0] / pattern.shape[0]
    sx = pattern_size_m[1] / pattern.shape[1]
    pat_xy = np.asarray(xy_pat)[inl]
    obj = np.stack([pat_xy[:, 0] * sx, pat_xy[:, 1] * sy, np.zeros(inl.sum())], 1)
    img_pts = np.asarray(xy_img)[inl]
    return obj.astype(np.float32), img_pts.astype(np.float32), int(inl.sum())
