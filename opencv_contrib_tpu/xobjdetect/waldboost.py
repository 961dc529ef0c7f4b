"""WaldBoost detector over integral channel features (ICF).

Reference anchors: xobjdetect/src/wbdetector.cpp (WBDetectorImpl::train /
detect), xobjdetect/src/waldboost.cpp (stump boosting + rejection
thresholds), ICF channels per Dollar et al. (gray + |grad| + 6 orientation
bins — the reference's feature_evaluator builds the same stack).

TPU-first: training draws all candidate-stump responses as one (n_samples,
n_features) matrix (a batched integral-image gather) and the AdaBoost round
reduces over it; detection evaluates the whole boosted cascade for every
window in one shot, applying the Wald early-rejection thresholds as masks
on the running score.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.ops import filters
from opencv_contrib_tpu.ops.integral import integral

N_ORIENT = 6
N_CH = N_ORIENT + 2  # orientations + gray + gradient magnitude


def icf_channels(img):
    """Integral-channel-feature stack (N_CH, H, W)."""
    gy, gx = filters.gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi), orientation mod pi
    bin_f = ((ang + jnp.pi) % jnp.pi) / jnp.pi * N_ORIENT
    b = jnp.clip(bin_f.astype(jnp.int32), 0, N_ORIENT - 1)
    orient = (b[None] == jnp.arange(N_ORIENT)[:, None, None]) * mag[None]
    return jnp.concatenate([img[None], mag[None], orient], axis=0)


def make_feature_pool(key, win: int = 24, n_features: int = 512):
    """Random box features: (channel, y0, x0, y1, x1) per feature."""
    kc, ky, kx, kh, kw = jax.random.split(key, 5)
    ch = jax.random.randint(kc, (n_features,), 0, N_CH)
    y0 = jax.random.randint(ky, (n_features,), 0, win - 4)
    x0 = jax.random.randint(kx, (n_features,), 0, win - 4)
    h = jax.random.randint(kh, (n_features,), 2, win // 2)
    w = jax.random.randint(kw, (n_features,), 2, win // 2)
    y1 = jnp.minimum(y0 + h, win - 1)
    x1 = jnp.minimum(x0 + w, win - 1)
    return jnp.stack([ch, y0, x0, y1, x1], axis=1)  # (F, 5)


@partial(jax.jit, static_argnames=("win",))
def window_features(img, centers_yx, pool, win: int = 24):
    """Evaluate every pool feature on every window: (N, F) responses.
    One integral image per channel; all boxes are static-shape gathers."""
    chans = icf_channels(img)
    iis = jax.vmap(integral)(chans)  # (C, H+1, W+1)
    tl = centers_yx - win // 2  # (N, 2) top-left

    def one_feature(f):
        c, y0, x0, y1, x1 = f[0], f[1], f[2], f[3], f[4]
        ii = iis[c]
        ay = tl[:, 0] + y0
        ax = tl[:, 1] + x0
        by = tl[:, 0] + y1
        bx = tl[:, 1] + x1
        H, W = ii.shape

        def at(y, x):
            y = jnp.clip(y, 0, H - 1)
            x = jnp.clip(x, 0, W - 1)
            return ii[y, x]

        s = at(by + 1, bx + 1) - at(ay, bx + 1) - at(by + 1, ax) + at(ay, ax)
        return s / ((y1 - y0 + 1) * (x1 - x0 + 1))

    return jax.vmap(one_feature, out_axes=1)(pool)  # (N, F)


class WaldBoostModel(NamedTuple):
    pool: jnp.ndarray  # (F, 5)
    feat_idx: jnp.ndarray  # (T,) chosen feature per round
    thresh: jnp.ndarray  # (T,)
    polarity: jnp.ndarray  # (T,) +-1
    alpha: jnp.ndarray  # (T,) stump weight
    reject: jnp.ndarray  # (T,) Wald rejection threshold on the running score
    win: int


def train(pos_feats, neg_feats, pool, n_rounds: int = 32, win: int = 24,
          reject_quantile: float = 0.02) -> WaldBoostModel:
    """AdaBoost stump training with per-round Wald rejection thresholds
    (waldboost.cpp: after each round the threshold is set so that
    ~reject_quantile of positives would be dropped). Host loop over rounds;
    each round's stump search is one vectorized pass."""
    X = np.concatenate([np.asarray(pos_feats), np.asarray(neg_feats)])
    y = np.concatenate([np.ones(len(pos_feats)), -np.ones(len(neg_feats))])
    w = np.ones(len(y)) / len(y)
    F = X.shape[1]
    feat_idx, thresh, polarity, alpha, reject = [], [], [], [], []
    run_score = np.zeros(len(y))
    # candidate thresholds per feature: quartiles of the data
    for _ in range(n_rounds):
        best = (1e9, 0, 0.0, 1.0)
        qs = np.quantile(X, [0.2, 0.35, 0.5, 0.65, 0.8], axis=0)  # (5, F)
        for qi in range(qs.shape[0]):
            pred = np.where(X > qs[qi][None, :], 1.0, -1.0)  # (N, F)
            err_pos = ((pred != y[:, None]) * w[:, None]).sum(0)  # polarity +1
            err_neg = 1.0 - err_pos
            e = np.minimum(err_pos, err_neg)
            j = int(np.argmin(e))
            if e[j] < best[0]:
                pol = 1.0 if err_pos[j] <= err_neg[j] else -1.0
                best = (e[j], j, qs[qi][j], pol)
        e, j, th, pol = best
        e = np.clip(e, 1.0 / (2 * len(y)), 1 - 1e-6)  # smooth: keeps alpha finite and diversifies features
        a = 0.5 * np.log((1 - e) / e)
        h = pol * np.where(X[:, j] > th, 1.0, -1.0)
        w = w * np.exp(-a * y * h)
        w /= w.sum()
        run_score += a * h
        # Wald rejection: keep reject_quantile of positives margin
        # margin must exceed float32 cumsum rounding at detection time
        rej = np.quantile(run_score[y > 0], reject_quantile) - max(1e-3, 1e-4 * abs(run_score).max())
        feat_idx.append(j)
        thresh.append(th)
        polarity.append(pol)
        alpha.append(a)
        reject.append(rej)
    return WaldBoostModel(
        jnp.asarray(pool), jnp.asarray(feat_idx, jnp.int32), jnp.asarray(thresh, jnp.float32),
        jnp.asarray(polarity, jnp.float32), jnp.asarray(alpha, jnp.float32),
        jnp.asarray(reject, jnp.float32), win,
    )


@jax.jit
def _score_windows(feats, model: WaldBoostModel):
    """Boosted score with Wald early rejection as a mask over the running
    cumulative score (all stumps evaluated for all windows — the TPU way)."""
    x = feats[:, model.feat_idx]  # (N, T)
    h = model.polarity[None] * jnp.where(x > model.thresh[None], 1.0, -1.0)
    scores = jnp.cumsum(model.alpha[None] * h, axis=1)  # (N, T)
    alive = jnp.all(scores >= model.reject[None], axis=1)
    return jnp.where(alive, scores[:, -1], -jnp.inf)


def detect(img, model: WaldBoostModel, stride: int = 4, score_thresh: float = 0.0):
    """Sliding-window detection at the model's native scale. Returns
    (centers (N, 2), scores (N,)) above threshold."""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    win = model.win
    ys = jnp.arange(win // 2, H - win // 2, stride)
    xs = jnp.arange(win // 2, W - win // 2, stride)
    centers = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1).reshape(-1, 2)
    feats = window_features(img, centers, model.pool, win=win)
    scores = _score_windows(feats, model)
    keep = np.asarray(scores) > score_thresh
    return np.asarray(centers)[keep], np.asarray(scores)[keep]
