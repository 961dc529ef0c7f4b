"""MIL tracker: online multiple-instance boosting over Haar-like features.

Reference anchors: tracking/src/trackerMIL.cpp + trackerMILModel.cpp and the
Haar feature bank in tracking/src/feature.cpp (~3k LoC): a pool of random
two-rectangle Haar responses; weak classifiers are online Gaussian
posteriors; boosting greedily selects K weak learners maximizing the bag
log-likelihood (positive bag = patches near the target, negative = ring).

TPU-first: the feature bank is evaluated for ALL candidate patches as one
batched integral-image gather; the online mean/var updates and the greedy
selection loop run vectorized over the whole classifier pool (the greedy
argmax is a lax K-step scan over pool scores).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import sample_bilinear
from opencv_contrib_tpu.ops.integral import integral


def make_feature_bank(key, patch: int = 32, n_features: int = 250):
    """Random two-rectangle Haar bank (feature.cpp CvHaarEvaluator):
    each feature = (rect1, rect2, weight1, weight2) in patch-normalized
    coords. Returns a dict of (n_features, 4) int arrays y0,x0,y1,x1 per
    rect plus weights (n_features, 2)."""
    k1, k2, k3 = jax.random.split(key, 3)
    y0 = jax.random.randint(k1, (n_features, 2), 0, patch - 4)
    x0 = jax.random.randint(k2, (n_features, 2), 0, patch - 4)
    hw = jax.random.randint(k3, (n_features, 2, 2), 2, patch // 2)
    y1 = jnp.minimum(y0 + hw[..., 0], patch - 1)
    x1 = jnp.minimum(x0 + hw[..., 1], patch - 1)
    weights = jnp.stack([jnp.ones(n_features), -jnp.ones(n_features)], axis=1)
    return {"y0": y0, "x0": x0, "y1": y1, "x1": x1, "w": weights.astype(jnp.float32)}


def _haar_responses(patches, bank):
    """patches (N, P, P) -> (N, F) box-sum differences via integral images."""
    ii = jax.vmap(integral)(patches)  # (N, P+1, P+1)

    def boxsum(iimg, y0, x0, y1, x1):
        return iimg[y1 + 1, x1 + 1] - iimg[y0, x1 + 1] - iimg[y1 + 1, x0] + iimg[y0, x0]

    def per_patch(iimg):
        s = jax.vmap(jax.vmap(boxsum, in_axes=(None, 0, 0, 0, 0)), in_axes=(None, 1, 1, 1, 1), out_axes=1)(
            iimg, bank["y0"], bank["x0"], bank["y1"], bank["x1"]
        )  # (F, 2)
        area = (bank["y1"] - bank["y0"] + 1) * (bank["x1"] - bank["x0"] + 1)
        return (s / area * bank["w"]).sum(-1)

    return jax.vmap(per_patch)(ii)


class MilState(NamedTuple):
    center: jnp.ndarray  # (2,)
    mu_pos: jnp.ndarray  # (F,) weak classifier Gaussian means (positive)
    sig_pos: jnp.ndarray
    mu_neg: jnp.ndarray
    sig_neg: jnp.ndarray


def _extract(img, centers, patch):
    o = jnp.arange(patch, dtype=jnp.float32) - patch / 2 + 0.5
    y = centers[:, 0:1, None] + o[None, :, None]
    x = centers[:, 1:2, None] + o[None, None, :]
    return sample_bilinear(img, y * jnp.ones((1, 1, patch)), x * jnp.ones((1, patch, 1)))


def _loglik(f, mu, sig):
    return -0.5 * ((f - mu) / sig) ** 2 - jnp.log(sig)


def _classifier_scores(feats, state: MilState, sel=None):
    """Per-patch score = sum over (selected) weak learners of
    log p(f|pos) - log p(f|neg)."""
    ll = _loglik(feats, state.mu_pos, state.sig_pos) - _loglik(feats, state.mu_neg, state.sig_neg)
    if sel is not None:
        ll = ll * sel[None]
    return ll.sum(-1)


def _sample_offsets(key, n, radius, min_radius=0.0):
    ka, kr = jax.random.split(key)
    a = jax.random.uniform(ka, (n,), minval=0, maxval=2 * jnp.pi)
    r = jnp.sqrt(jax.random.uniform(kr, (n,), minval=(min_radius / max(radius, 1e-6)) ** 2, maxval=1.0)) * radius
    return jnp.stack([r * jnp.sin(a), r * jnp.cos(a)], axis=1)


def _grid_offsets(radius: float, step: float):
    """Dense candidate grid (trackerMILModel samples the search region
    exhaustively on the image grid)."""
    o = jnp.arange(-radius, radius + 1e-6, step, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(o, o, indexing="ij")
    return jnp.stack([dy.reshape(-1), dx.reshape(-1)], axis=1)


def mil_init(img, center_yx, key, bank, patch: int = 32) -> MilState:
    """Train the weak-classifier pool at the given position (no detection
    pass — the classifier is untrained at init)."""
    center = jnp.asarray(center_yx, jnp.float32)
    F = bank["y0"].shape[0]
    st = MilState(center, jnp.zeros(F), jnp.ones(F), jnp.zeros(F), jnp.ones(F))
    bank_arrays = tuple(bank[k] for k in ("y0", "x0", "y1", "x1", "w"))
    return _mil_train(st, img, key, bank_arrays, patch, 16, 32, 1.0)


@partial(jax.jit, static_argnames=("patch", "n_pos", "n_neg", "lr"))
def _mil_train(state, img, key, bank_arrays, patch, n_pos, n_neg, lr):
    bank = dict(zip(("y0", "x0", "y1", "x1", "w"), bank_arrays))
    kp, kn = jax.random.split(key)
    pos = state.center[None] + _sample_offsets(kp, n_pos, 3.0)
    neg = state.center[None] + _sample_offsets(kn, n_neg, 40.0, min_radius=12.0)
    f_pos = _haar_responses(_extract(img, pos, patch), bank)
    f_neg = _haar_responses(_extract(img, neg, patch), bank)

    def upd(mu, sig, f):
        m, s = f.mean(0), f.std(0) + 1e-3
        return (1 - lr) * mu + lr * m, jnp.sqrt((1 - lr) * sig**2 + lr * s**2) + 1e-4

    mu_p, sig_p = upd(state.mu_pos, state.sig_pos, f_pos)
    mu_n, sig_n = upd(state.mu_neg, state.sig_neg, f_neg)
    return MilState(state.center, mu_p, sig_p, mu_n, sig_n)


def mil_update(state: MilState, img, key, bank, patch: int = 32, n_pos: int = 16,
               n_neg: int = 32, search_radius: float = 8.0, k_sel: int = 50, lr: float = 0.15):
    """One MIL tracking step. Returns (new_state, best_score)."""
    bank_arrays = tuple(bank[k] for k in ("y0", "x0", "y1", "x1", "w"))
    return _mil_step_dyn(state, img, key, bank_arrays, patch, n_pos, n_neg, search_radius, k_sel, lr)


@partial(jax.jit, static_argnames=("patch", "n_pos", "n_neg", "search_radius", "k_sel", "lr"))
def _mil_step_dyn(state, img, key, bank_arrays, patch, n_pos, n_neg, search_radius, k_sel, lr):
    bank = dict(zip(("y0", "x0", "y1", "x1", "w"), bank_arrays))
    kc, kp, kn = jax.random.split(key, 3)
    cand = state.center[None] + _grid_offsets(search_radius, 1.0)
    feats_c = _haar_responses(_extract(img, cand, patch), bank)
    disc = jnp.abs(state.mu_pos - state.mu_neg) / (state.sig_pos + state.sig_neg)
    _, top = jax.lax.top_k(disc, k_sel)
    sel = jnp.zeros(disc.shape[0]).at[top].set(1.0)
    scores = _classifier_scores(feats_c, state, sel)
    best = jnp.argmax(scores)
    center = cand[best]

    pos = center[None] + _sample_offsets(kp, n_pos, 3.0)
    neg = center[None] + _sample_offsets(kn, n_neg, 40.0, min_radius=12.0)
    f_pos = _haar_responses(_extract(img, pos, patch), bank)
    f_neg = _haar_responses(_extract(img, neg, patch), bank)

    def upd(mu, sig, f):
        m, s = f.mean(0), f.std(0) + 1e-3
        return (1 - lr) * mu + lr * m, jnp.sqrt((1 - lr) * sig**2 + lr * s**2) + 1e-4

    mu_p, sig_p = upd(state.mu_pos, state.sig_pos, f_pos)
    mu_n, sig_n = upd(state.mu_neg, state.sig_neg, f_neg)
    return MilState(center, mu_p, sig_p, mu_n, sig_n), scores[best]
