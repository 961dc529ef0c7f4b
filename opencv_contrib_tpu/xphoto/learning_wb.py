"""Learning-based white balance.

Reference anchor: xphoto/src/learning_based_color_balance.cpp
(LearningBasedWBImpl: per-image statistical features — average color,
brightest color, dominant color palette from a histogram — fed to learned
regression stumps that predict the illuminant chromaticity).

TPU-first: the feature extraction is batched jnp (histograms via
segment-sum); the regressor is a linear model over the features with
closed-form ridge training (`fit_wb_model`) replacing the reference's
offline-trained tree ensemble — same feature set, same inference API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def wb_features(img, sat_thresh: float = 0.98, nbins: int = 16):
    """Illuminant-estimation features (learning_based_color_balance.cpp
    getAverageAndBrightestColor + histogram features): returns (F,) with
    [avg chroma (2), brightest chroma (2), dominant chroma (2), max-sat (1)].
    img (H, W, 3) RGB in [0, 1]."""
    img = jnp.asarray(img, jnp.float32)
    flat = img.reshape(-1, 3)
    s = flat.sum(-1)
    ok = (flat.max(-1) < sat_thresh) & (s > 1e-3)
    w = ok.astype(jnp.float32)

    avg = (flat * w[:, None]).sum(0) / jnp.maximum(w.sum(), 1)
    avg_c = avg[:2] / jnp.maximum(avg.sum(), 1e-6)

    bright_i = jnp.argmax(jnp.where(ok, s, -1.0))
    b = flat[bright_i]
    bright_c = b[:2] / jnp.maximum(b.sum(), 1e-6)

    # dominant color: max bin of a joint (r/s, g/s) chromaticity histogram
    r_c = jnp.clip((flat[:, 0] / jnp.maximum(s, 1e-6) * nbins).astype(jnp.int32), 0, nbins - 1)
    g_c = jnp.clip((flat[:, 1] / jnp.maximum(s, 1e-6) * nbins).astype(jnp.int32), 0, nbins - 1)
    hist = jnp.zeros(nbins * nbins).at[r_c * nbins + g_c].add(w)
    dom = jnp.argmax(hist)
    dom_c = jnp.stack([(dom // nbins + 0.5) / nbins, (dom % nbins + 0.5) / nbins])

    max_sat = jnp.max(jnp.where(ok, flat.max(-1) - flat.min(-1), 0.0))
    return jnp.concatenate([avg_c, bright_c, dom_c, max_sat[None], jnp.ones(1)])


def fit_wb_model(imgs, illuminants, ridge: float = 1e-3):
    """Ridge-fit the linear feature->illuminant-chromaticity regressor from
    (image, illuminant RGB) training pairs — the trainable stand-in for the
    reference's shipped model file."""
    X = np.stack([np.asarray(wb_features(im)) for im in imgs])
    L = np.asarray(illuminants, np.float32)
    y = L[:, :2] / np.maximum(L.sum(1, keepdims=True), 1e-6)
    W = np.linalg.solve(X.T @ X + ridge * np.eye(X.shape[1]), X.T @ y)
    return jnp.asarray(W)  # (F, 2)


def learning_wb(img, model):
    """Estimate the illuminant with the learned regressor and correct the
    image (balanceWhite of LearningBasedWB)."""
    img = jnp.asarray(img, jnp.float32)
    f = wb_features(img)
    chroma = jnp.clip(f @ model, 0.05, 0.9)  # (r, g) of the illuminant
    ill = jnp.concatenate([chroma, (1.0 - chroma.sum())[None]])
    gains = ill.mean() / jnp.maximum(ill, 1e-6)
    return jnp.clip(img * gains[None, None], 0.0, 1.0), ill
