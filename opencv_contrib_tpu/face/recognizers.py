"""Face recognizers: PCA (eigenfaces), LDA (fisherfaces), LBP histograms.

Each follows the reference's train/predict/save/load contract; the linear
algebra is batched jnp (covariance eigendecompositions, histogram
matmuls). Distances: L2 in subspace (eigen/fisher), chi-square (LBPH).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class SubspaceModel(NamedTuple):
    mean: jnp.ndarray  # (D,)
    basis: jnp.ndarray  # (D, K)
    projections: jnp.ndarray  # (N, K)
    labels: jnp.ndarray  # (N,)


class EigenFaces:
    """PCA subspace recognizer (EigenFaces parity)."""

    def __init__(self, n_components: int = 16):
        self.n_components = n_components
        self.model: SubspaceModel | None = None

    def train(self, images, labels):
        X = jnp.stack([jnp.asarray(im, jnp.float32).reshape(-1) for im in images])
        labels = jnp.asarray(labels, jnp.int32)
        mean = X.mean(axis=0)
        Xc = X - mean
        # eigen via SVD of the centered data
        U, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
        K = min(self.n_components, Vt.shape[0])
        basis = Vt[:K].T  # (D, K)
        proj = Xc @ basis
        self.model = SubspaceModel(mean, basis, proj, labels)
        return self

    def predict(self, image):
        m = self.model
        x = jnp.asarray(image, jnp.float32).reshape(-1) - m.mean
        p = x @ m.basis
        d = jnp.sum((m.projections - p[None]) ** 2, axis=1)
        i = jnp.argmin(d)
        return int(m.labels[i]), float(jnp.sqrt(d[i]))

    def save(self, path):
        np.savez(path, mean=np.asarray(self.model.mean), basis=np.asarray(self.model.basis),
                 projections=np.asarray(self.model.projections), labels=np.asarray(self.model.labels))

    def load(self, path):
        d = np.load(path)
        self.model = SubspaceModel(
            jnp.asarray(d["mean"]), jnp.asarray(d["basis"]),
            jnp.asarray(d["projections"]), jnp.asarray(d["labels"]),
        )
        return self


class FisherFaces:
    """PCA -> LDA recognizer (FisherFaces parity)."""

    def __init__(self, n_components: int | None = None):
        self.n_components = n_components
        self.model: SubspaceModel | None = None

    def train(self, images, labels):
        X = jnp.stack([jnp.asarray(im, jnp.float32).reshape(-1) for im in images])
        y = np.asarray(labels)
        classes = np.unique(y)
        C = len(classes)
        N = X.shape[0]
        mean = X.mean(axis=0)
        Xc = X - mean
        # PCA to N - C dims first (standard fisherfaces recipe)
        U, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
        Kp = max(min(N - C, Vt.shape[0]), 1)
        W_pca = Vt[:Kp].T
        Z = Xc @ W_pca  # (N, Kp)

        # LDA in PCA space
        Sw = jnp.zeros((Kp, Kp))
        Sb = jnp.zeros((Kp, Kp))
        zmean = Z.mean(axis=0)
        for c in classes:
            Zc = Z[jnp.asarray(y == c)]
            mu = Zc.mean(axis=0)
            d = Zc - mu
            Sw = Sw + d.T @ d
            n_c = Zc.shape[0]
            mb = (mu - zmean)[:, None]
            Sb = Sb + n_c * (mb @ mb.T)
        evals, evecs = jnp.linalg.eigh(jnp.linalg.solve(Sw + 1e-6 * jnp.eye(Kp), Sb))
        K = self.n_components or (C - 1)
        W_lda = evecs[:, ::-1][:, :K]
        basis = W_pca @ W_lda  # (D, K)
        proj = Xc @ basis
        self.model = SubspaceModel(mean, basis, proj, jnp.asarray(y, jnp.int32))
        return self

    def predict(self, image):
        m = self.model
        x = jnp.asarray(image, jnp.float32).reshape(-1) - m.mean
        p = x @ m.basis
        d = jnp.sum((m.projections - p[None]) ** 2, axis=1)
        i = jnp.argmin(d)
        return int(m.labels[i]), float(jnp.sqrt(d[i]))


def lbp_image(img: jnp.ndarray) -> jnp.ndarray:
    """8-neighbor local binary pattern codes (0..255) per pixel."""
    shifts = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]
    code = jnp.zeros(img.shape, jnp.int32)
    for i, (dy, dx) in enumerate(shifts):
        code = code | ((jnp.roll(img, (dy, dx), (0, 1)) >= img).astype(jnp.int32) << i)
    return code


def _lbph_features(img: jnp.ndarray, grid: int = 8) -> jnp.ndarray:
    """Spatial grid of LBP histograms -> (grid*grid*256,) L1-normalized."""
    code = lbp_image(jnp.asarray(img, jnp.float32))
    H, W = code.shape
    th, tw = H // grid, W // grid
    code = code[: th * grid, : tw * grid]
    cells = code.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(grid * grid, -1)
    onehot = jax.nn.one_hot(cells, 256, dtype=jnp.float32)
    hists = onehot.sum(axis=1)
    hists = hists / jnp.maximum(hists.sum(axis=1, keepdims=True), 1.0)
    return hists.reshape(-1)


class LBPH:
    """Local-binary-pattern histogram recognizer (LBPH parity); chi-square
    nearest neighbor over grid histograms."""

    def __init__(self, grid: int = 8):
        self.grid = grid
        self.features = None
        self.labels = None

    def train(self, images, labels):
        self.features = jnp.stack([_lbph_features(im, self.grid) for im in images])
        self.labels = jnp.asarray(labels, jnp.int32)
        return self

    def update(self, images, labels):
        """Incremental training (LBPH supports update() in the reference)."""
        f = jnp.stack([_lbph_features(im, self.grid) for im in images])
        self.features = jnp.concatenate([self.features, f])
        self.labels = jnp.concatenate([self.labels, jnp.asarray(labels, jnp.int32)])
        return self

    def predict(self, image):
        f = _lbph_features(image, self.grid)
        chi2 = jnp.sum((self.features - f[None]) ** 2 / jnp.maximum(self.features + f[None], 1e-9), axis=1)
        i = jnp.argmin(chi2)
        return int(self.labels[i]), float(chi2[i])
