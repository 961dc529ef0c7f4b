"""Facemark: facial landmark fitting by cascaded shape regression (LBF/
Kazemi class).

Reference anchors: face/src/facemarkLBF.cpp (FacemarkLBF: local binary
features from random-forest leaf codes + global linear regression per
cascade stage) and face/src/face_alignment.cpp (FacemarkKazemi: cascaded
gradient-boosted regression on pixel-difference features). Both are
"cascaded regression from image features indexed relative to the current
shape estimate".

TPU-first: each cascade stage samples pixel-difference features around ALL
current landmarks in one batched gather and applies a dense linear
regressor on the MXU; training solves each stage with ridge regression on
mini datasets (the reference trains offline and ships model files — here
`train` is first-class so tests are self-contained).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import sample_bilinear


class FacemarkModel(NamedTuple):
    mean_shape: jnp.ndarray  # (L, 2) in [0, 1]^2 box coords
    offsets: jnp.ndarray  # (S, F, 2) feature point offsets per stage (box units)
    pairs: jnp.ndarray  # (S, P, 2) int index pairs into the F feature points
    W: jnp.ndarray  # (S, P, L*2) stage regressors
    b: jnp.ndarray  # (S, L*2)


def _stage_features(img, shape_px, offsets, pairs, box_size):
    """Pixel-difference features indexed relative to the current shape:
    sample F points around each landmark's nearest anchor, difference the
    P pairs (the LBF/Kazemi feature construction)."""
    L = shape_px.shape[0]
    F = offsets.shape[0]
    anchor = shape_px[jnp.arange(F) % L]  # cycle anchors over landmarks
    pts = anchor + offsets * box_size  # (F, 2) (y, x)
    vals = sample_bilinear(img, pts[:, 0], pts[:, 1])  # (F,)
    return vals[pairs[:, 0]] - vals[pairs[:, 1]]  # (P,)


@partial(jax.jit, static_argnames=())
def fit(model: FacemarkModel, img, box):
    """Fit landmarks inside box (y0, x0, size). Returns (L, 2) pixel
    coords. Cascade: shape += W @ features(shape) per stage
    (FacemarkLBF::fitImpl / Kazemi predict)."""
    y0, x0, bs = box[0], box[1], box[2]
    shape = model.mean_shape * bs + jnp.stack([y0, x0])  # (L, 2)

    def stage(shape, s):
        f = _stage_features(img, shape, model.offsets[s], model.pairs[s], bs)
        delta = (f @ model.W[s] + model.b[s]).reshape(-1, 2)
        return shape + delta * bs, None

    S = model.offsets.shape[0]
    shape, _ = jax.lax.scan(stage, shape, jnp.arange(S))
    return shape


def train(images, shapes, boxes, n_stages: int = 3, n_feature_pts: int = 64,
          n_pairs: int = 128, ridge: float = 1.0, seed: int = 0) -> FacemarkModel:
    """Train the cascade by sequential ridge regression (the reference's
    per-stage global linear regression, facemarkLBF.cpp GlobalRegression).
    images: list of (H, W); shapes: (N, L, 2) pixel coords; boxes (N, 3)."""
    rng = np.random.default_rng(seed)
    shapes = np.asarray(shapes, np.float32)
    boxes = np.asarray(boxes, np.float32)
    N, L, _ = shapes.shape
    # mean shape in box coords
    norm = (shapes - boxes[:, None, :2]) / boxes[:, None, 2:3]
    mean_shape = norm.mean(0)

    offsets_all, pairs_all, W_all, b_all = [], [], [], []
    cur = np.stack([mean_shape * b[2] + b[:2] for b in boxes])  # (N, L, 2)
    for s in range(n_stages):
        radius = 0.25 * (0.6 ** s)  # shrinking feature support per stage
        offsets = rng.uniform(-radius, radius, (n_feature_pts, 2)).astype(np.float32)
        pairs = rng.integers(0, n_feature_pts, (n_pairs, 2)).astype(np.int32)
        X = np.zeros((N, n_pairs), np.float32)
        for i in range(N):
            X[i] = np.asarray(_stage_features(
                jnp.asarray(images[i]), jnp.asarray(cur[i]),
                jnp.asarray(offsets), jnp.asarray(pairs), boxes[i, 2]))
        Y = ((shapes - cur) / boxes[:, None, 2:3]).reshape(N, -1)
        Xb = np.concatenate([X, np.ones((N, 1), np.float32)], 1)
        Wb = np.linalg.solve(Xb.T @ Xb + ridge * np.eye(n_pairs + 1), Xb.T @ Y)
        W, b = Wb[:-1], Wb[-1]
        cur = cur + ((X @ W + b).reshape(N, L, 2)) * boxes[:, None, 2:3]
        offsets_all.append(offsets)
        pairs_all.append(pairs)
        W_all.append(W)
        b_all.append(b)
    return FacemarkModel(
        jnp.asarray(mean_shape), jnp.asarray(np.stack(offsets_all)),
        jnp.asarray(np.stack(pairs_all)), jnp.asarray(np.stack(W_all)),
        jnp.asarray(np.stack(b_all)))
