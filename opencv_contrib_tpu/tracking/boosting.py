"""Online-AdaBoost tracker (Grabner et al.), the tracking module's
TrackerBoosting (tracking/src/trackerBoosting.cpp + the online boosting
machinery in trackerBoostingModel.cpp / feature.cpp).

Structure: a pool of Haar weak hypotheses (running Gaussian per class, the
same bank MIL uses), K selectors each choosing the pool member with the
lowest importance-weighted error; strong classifier = sum of alpha-weighted
selected stumps; per-frame update re-weights samples through the selector
chain exactly like online AdaBoost.

TPU-first: the selector chain is a lax.scan over K steps; each step updates
the (K-independent) per-feature error accumulators for ALL pool members at
once, so the argmin selection is a vector reduce, not a loop over features.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.tracking.mil import (
    _extract,
    _grid_offsets,
    _haar_responses,
    _loglik,
    _sample_offsets,
    make_feature_bank,
)

__all__ = ["make_feature_bank", "BoostState", "boosting_init", "boosting_update"]


class BoostState(NamedTuple):
    center: jnp.ndarray   # (2,)
    mu_pos: jnp.ndarray   # (F,) running class Gaussians (weak hypotheses)
    sig_pos: jnp.ndarray
    mu_neg: jnp.ndarray
    sig_neg: jnp.ndarray
    lam_c: jnp.ndarray    # (K, F) importance mass classified correctly
    lam_w: jnp.ndarray    # (K, F) importance mass classified wrongly
    chosen: jnp.ndarray   # (K,) selected pool member per selector
    alpha: jnp.ndarray    # (K,) selector vote weights


def _stump(feats, st: BoostState):
    """Weak hypothesis decision per (sample, feature): +1 if the Gaussian
    log-likelihood favors the positive class."""
    ll = _loglik(feats, st.mu_pos, st.sig_pos) - _loglik(feats, st.mu_neg, st.sig_neg)
    return jnp.where(ll > 0, 1.0, -1.0)


def _update_gaussians(st: BoostState, f_pos, f_neg, lr):
    def upd(mu, sig, f):
        m, s = f.mean(0), f.std(0) + 1e-3
        return (1 - lr) * mu + lr * m, jnp.sqrt((1 - lr) * sig**2 + lr * s**2) + 1e-4

    mu_p, sig_p = upd(st.mu_pos, st.sig_pos, f_pos)
    mu_n, sig_n = upd(st.mu_neg, st.sig_neg, f_neg)
    return st._replace(mu_pos=mu_p, sig_pos=sig_p, mu_neg=mu_n, sig_neg=sig_n)


def _boost_pass(st: BoostState, feats, labels):
    """One online-AdaBoost pass: propagate sample importances lambda through
    the K selectors, updating error accumulators and re-choosing the best
    pool member per selector."""
    h = _stump(feats, st)                       # (N, F) in {-1, +1}
    correct = (h == labels[:, None]).astype(jnp.float32)  # (N, F)

    def step(carry, sel_state):
        lam, used = carry                        # (N,) importances, (F,) mask
        lam_c_k, lam_w_k = sel_state             # (F,), (F,)
        lam_c_k = lam_c_k + jnp.einsum("n,nf->f", lam, correct)
        lam_w_k = lam_w_k + jnp.einsum("n,nf->f", lam, 1.0 - correct)
        err = lam_w_k / jnp.maximum(lam_c_k + lam_w_k, 1e-9)  # (F,)
        # each selector must own a DISTINCT pool member (Grabner's selectors
        # hold disjoint weak sets); otherwise ties make K copies of one stump
        m = jnp.argmin(jnp.where(used > 0, jnp.inf, err))
        used = used.at[m].set(1.0)
        e = jnp.clip(err[m], 1e-4, 0.5 - 1e-4)
        a = 0.5 * jnp.log((1.0 - e) / e)
        # AdaBoost importance update through the chosen stump
        ok = correct[:, m]
        lam = lam * jnp.where(ok > 0, 1.0 / (2.0 * (1.0 - e)), 1.0 / (2.0 * e))
        lam = lam / jnp.mean(lam)
        return (lam, used), (lam_c_k, lam_w_k, m, a)

    lam0 = jnp.ones(feats.shape[0])
    used0 = jnp.zeros(st.mu_pos.shape[0])
    _, (lam_c, lam_w, chosen, alpha) = jax.lax.scan(
        step, (lam0, used0), (st.lam_c, st.lam_w))
    return st._replace(lam_c=lam_c, lam_w=lam_w, chosen=chosen, alpha=alpha)


def _strong_scores(feats, st: BoostState):
    h = _stump(feats, st)                       # (N, F)
    hk = h[:, st.chosen]                        # (N, K)
    return hk @ st.alpha                        # (N,)


def boosting_init(img, center_yx, key, bank, patch: int = 32,
                  n_selectors: int = 50) -> BoostState:
    center = jnp.asarray(center_yx, jnp.float32)
    F = bank["y0"].shape[0]
    st = BoostState(center, jnp.zeros(F), jnp.ones(F), jnp.zeros(F), jnp.ones(F),
                    jnp.full((n_selectors, F), 1e-2), jnp.full((n_selectors, F), 1e-2),
                    jnp.zeros(n_selectors, jnp.int32), jnp.zeros(n_selectors))
    bank_arrays = tuple(bank[k] for k in ("y0", "x0", "y1", "x1", "w"))
    return _boost_train(st, img, key, bank_arrays, patch, 16, 32, 0.5)


@partial(jax.jit, static_argnames=("patch", "n_pos", "n_neg", "lr"))
def _boost_train(st, img, key, bank_arrays, patch, n_pos, n_neg, lr):
    bank = dict(zip(("y0", "x0", "y1", "x1", "w"), bank_arrays))
    kp, kn = jax.random.split(key)
    pos = st.center[None] + _sample_offsets(kp, n_pos, 3.0)
    neg = st.center[None] + _sample_offsets(kn, n_neg, 40.0, min_radius=12.0)
    f_pos = _haar_responses(_extract(img, pos, patch), bank)
    f_neg = _haar_responses(_extract(img, neg, patch), bank)
    st = _update_gaussians(st, f_pos, f_neg, lr)
    feats = jnp.concatenate([f_pos, f_neg], axis=0)
    labels = jnp.concatenate([jnp.ones(f_pos.shape[0]), -jnp.ones(f_neg.shape[0])])
    return _boost_pass(st, feats, labels)


def boosting_update(st: BoostState, img, key, bank, patch: int = 32,
                    search_radius: float = 10.0, lr: float = 0.2):
    """One Boosting tracking step. Returns (new_state, best_score)."""
    bank_arrays = tuple(bank[k] for k in ("y0", "x0", "y1", "x1", "w"))
    return _boost_step(st, img, key, bank_arrays, patch, search_radius, lr)


@partial(jax.jit, static_argnames=("patch", "search_radius", "lr"))
def _boost_step(st, img, key, bank_arrays, patch, search_radius, lr):
    bank = dict(zip(("y0", "x0", "y1", "x1", "w"), bank_arrays))
    kp, kn = jax.random.split(key)
    cand = st.center[None] + _grid_offsets(search_radius, 1.0)
    feats_c = _haar_responses(_extract(img, cand, patch), bank)
    scores = _strong_scores(feats_c, st)
    best = jnp.argmax(scores)
    st = st._replace(center=cand[best])

    pos = st.center[None] + _sample_offsets(kp, 16, 3.0)
    neg = st.center[None] + _sample_offsets(kn, 32, 40.0, min_radius=12.0)
    f_pos = _haar_responses(_extract(img, pos, patch), bank)
    f_neg = _haar_responses(_extract(img, neg, patch), bank)
    st = _update_gaussians(st, f_pos, f_neg, lr)
    feats = jnp.concatenate([f_pos, f_neg], axis=0)
    labels = jnp.concatenate([jnp.ones(f_pos.shape[0]), -jnp.ones(f_neg.shape[0])])
    st = _boost_pass(st, feats, labels)
    return st, scores[best]
