"""TLD (Tracking-Learning-Detection): median-flow tracking + a scanning
detection cascade + P/N learning.

Reference anchors: tracking/src/tld*.cpp (~6 files): tldDetector.cpp
(variance filter -> fern ensemble -> NN/NCC stages over a scanning-window
grid), tldEnsembleClassifier (13x 13-pair pixel-comparison ferns),
tldModel.cpp (positive/negative example stores, P/N updates), tldTracker.cpp
(median-flow + detector fusion, relocalization after loss).

TPU-first: the scanning grid is a static set of windows; all three cascade
stages evaluate EVERY window as batched tensor ops (variance via integral
images, fern codes via one gather per comparison pair, NCC against the
example stores as a matmul) with stage gates as masks rather than early
exits — on the MXU this is faster than branchy per-window rejection.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import sample_bilinear
from opencv_contrib_tpu.tracking.medianflow import Box, medianflow_update

PATCH = 15  # normalized patch side (reference uses 15x15 for the NN stage)
N_FERNS = 10
N_PAIRS = 8  # comparisons per fern -> 256-entry posterior tables
N_EXAMPLES = 64  # capacity of the positive/negative example stores


def fern_bank(key):
    """Random comparison-pair coordinates in [0,1)^2 per fern."""
    return jax.random.uniform(key, (N_FERNS, N_PAIRS, 2, 2))


class TldState(NamedTuple):
    box: Box
    posteriors: jnp.ndarray  # (N_FERNS, 2**N_PAIRS) fern P(pos|code)
    counts: jnp.ndarray  # (N_FERNS, 2**N_PAIRS, 2) pos/neg counts
    pos_ex: jnp.ndarray  # (N_EXAMPLES, PATCH*PATCH) normalized patches
    neg_ex: jnp.ndarray
    n_pos: jnp.ndarray  # () int
    n_neg: jnp.ndarray
    tracking: jnp.ndarray  # () bool — tracker confidence state machine


def _extract_norm(img, boxes_c, boxes_hw):
    """Sample each box to PATCH x PATCH and zero-mean normalize.
    boxes_c (N, 2), boxes_hw (N, 2) -> (N, PATCH*PATCH)."""
    t = (jnp.arange(PATCH) + 0.5) / PATCH - 0.5
    y = boxes_c[:, 0, None, None] + t[None, :, None] * boxes_hw[:, 0, None, None]
    x = boxes_c[:, 1, None, None] + t[None, None, :] * boxes_hw[:, 1, None, None]
    p = sample_bilinear(img, y * jnp.ones((1, 1, PATCH)), x * jnp.ones((1, PATCH, 1)))
    p = p.reshape(p.shape[0], -1)
    return p - p.mean(axis=1, keepdims=True)


def _fern_codes(img, boxes_c, boxes_hw, bank):
    """Binary codes per (window, fern): compare pixel pairs at
    box-normalized coordinates (tldEnsembleClassifier)."""
    rel = bank - 0.5  # (F, P, 2, 2) in [-0.5, 0.5)
    y = boxes_c[:, None, None, None, 0] + rel[None, ..., 0] * boxes_hw[:, None, None, None, 0]
    x = boxes_c[:, None, None, None, 1] + rel[None, ..., 1] * boxes_hw[:, None, None, None, 1]
    v = sample_bilinear(img, y, x)  # (N, F, P, 2)
    bits = (v[..., 0] > v[..., 1]).astype(jnp.int32)  # (N, F, P)
    weights = 2 ** jnp.arange(N_PAIRS, dtype=jnp.int32)
    return (bits * weights[None, None]).sum(-1)  # (N, F)


def _nn_conf(patches, pos_ex, neg_ex, n_pos, n_neg):
    """Relative similarity (tldModel Sr): NCC vs example stores."""

    def ncc(a, b):
        num = a @ b.T
        den = jnp.linalg.norm(a, axis=1)[:, None] * jnp.linalg.norm(b, axis=1)[None] + 1e-9
        return (num / den + 1.0) / 2.0

    mask_p = jnp.arange(N_EXAMPLES) < n_pos
    mask_n = jnp.arange(N_EXAMPLES) < n_neg
    sp = jnp.max(jnp.where(mask_p[None], ncc(patches, pos_ex), 0.0), axis=1)
    sn = jnp.max(jnp.where(mask_n[None], ncc(patches, neg_ex), 0.0), axis=1)
    return sp / (sp + sn + 1e-9)


def _scan_grid(box: Box, H, W, n_scales: int = 3, stride_frac: float = 0.25):
    """Static scanning-window grid around the whole frame at several scales
    of the current box (tldDetector's grid; sizes relative to the frame are
    static because PATCH-normalized sampling absorbs the box size)."""
    centers, sizes = [], []
    for s in range(n_scales):
        scale = 1.2 ** (s - n_scales // 2)
        hw = box.size * scale
        ny, nx = 12, 12  # static count; cover frame uniformly
        cy = jnp.linspace(0.0, 1.0, ny) * (H - 1)
        cx = jnp.linspace(0.0, 1.0, nx) * (W - 1)
        g = jnp.stack(jnp.meshgrid(cy, cx, indexing="ij"), axis=-1).reshape(-1, 2)
        centers.append(g)
        sizes.append(jnp.broadcast_to(hw[None], (g.shape[0], 2)))
    return jnp.concatenate(centers), jnp.concatenate(sizes)


def _push(store, count, ex):
    """Ring-buffer insert of one example row."""
    i = count % N_EXAMPLES
    return store.at[i].set(ex), count + 1


def tld_init(img, center_yx, size_hw, key) -> TldState:
    box = Box(jnp.asarray(center_yx, jnp.float32), jnp.asarray(size_hw, jnp.float32))
    n_codes = 2**N_PAIRS
    st = TldState(
        box,
        jnp.full((N_FERNS, n_codes), 0.5),
        jnp.zeros((N_FERNS, n_codes, 2)),
        jnp.zeros((N_EXAMPLES, PATCH * PATCH)),
        jnp.zeros((N_EXAMPLES, PATCH * PATCH)),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.ones((), bool),
    )
    return _tld_learn_init(st, img, fern_bank(key))


@jax.jit
def _tld_learn_init(st: TldState, img, bank):
    # positive: the init box (+ the P-expert would add warps; one example
    # suffices to seed, updates accumulate online)
    pos = _extract_norm(img, st.box.center[None], st.box.size[None])
    pos_ex, n_pos = _push(st.pos_ex, st.n_pos, pos[0])
    # negatives: far-away windows
    H, W = img.shape
    far = jnp.asarray([[H * 0.15, W * 0.15], [H * 0.15, W * 0.85], [H * 0.85, W * 0.15], [H * 0.85, W * 0.85]])
    negs = _extract_norm(img, far, jnp.broadcast_to(st.box.size[None], (4, 2)))
    neg_ex, n_neg = st.neg_ex, st.n_neg
    for i in range(4):
        neg_ex, n_neg = _push(neg_ex, n_neg, negs[i])
    counts = _fern_update(st.counts, img, st.box.center[None], st.box.size[None], bank, True)
    counts = _fern_update(counts, img, far, jnp.broadcast_to(st.box.size[None], (4, 2)), bank, False)
    post = (counts[..., 0] + 1.0) / (counts.sum(-1) + 2.0)
    return st._replace(posteriors=post, counts=counts, pos_ex=pos_ex, neg_ex=neg_ex, n_pos=n_pos, n_neg=n_neg)


def _fern_update(counts, img, boxes_c, boxes_hw, bank, positive):
    codes = _fern_codes(img, boxes_c, boxes_hw, bank)  # (N, F)
    cls = 0 if positive else 1
    f_idx = jnp.broadcast_to(jnp.arange(N_FERNS)[None], codes.shape)
    return counts.at[f_idx.reshape(-1), codes.reshape(-1), cls].add(1.0)


@partial(jax.jit, static_argnames=("conf_thresh",))
def tld_update(st: TldState, I0, I1, bank, conf_thresh: float = 0.6):
    """One TLD step on frame pair (I0 -> I1): median-flow track, full-frame
    detect, fuse, P/N learn. Returns (new_state, confidence)."""
    H, W = I1.shape
    tracked_box, trk_ok = medianflow_update(st.box, I0, I1, grid=8, levels=2)
    trk_ok = trk_ok & st.tracking

    # --- detection cascade over the scanning grid
    centers, sizes = _scan_grid(st.box, H, W)
    patches = _extract_norm(I1, centers, sizes)
    # stage 1: variance filter (reject flat windows)
    var = patches.var(axis=1)
    pos_var = jnp.where(st.n_pos > 0, st.pos_ex[0].var(), 1.0)
    pass1 = var > 0.5 * pos_var
    # stage 2: fern ensemble average posterior
    codes = _fern_codes(I1, centers, sizes, bank)
    fern_p = jnp.take_along_axis(st.posteriors, codes.T, axis=1).mean(0)
    pass2 = pass1 & (fern_p > 0.5)
    # stage 3: NN relative similarity
    nn = _nn_conf(patches, st.pos_ex, st.neg_ex, st.n_pos, st.n_neg)
    det_score = jnp.where(pass2, nn, 0.0)
    det_best = jnp.argmax(det_score)
    det_conf = det_score[det_best]

    # --- fusion: tracker wins when alive; detector relocalizes on loss
    trk_patch = _extract_norm(I1, tracked_box.center[None], tracked_box.size[None])
    trk_conf = _nn_conf(trk_patch, st.pos_ex, st.neg_ex, st.n_pos, st.n_neg)[0]
    use_det = (~trk_ok) & (det_conf > conf_thresh)
    center = jnp.where(use_det, centers[det_best], tracked_box.center)
    size = jnp.where(use_det, sizes[det_best], tracked_box.size)
    conf = jnp.where(use_det, det_conf, jnp.where(trk_ok, trk_conf, 0.0))
    new_box = Box(center, size)

    # --- P/N learning (only when confident, tldModel.cpp integration rule)
    learn = conf > conf_thresh
    cur = _extract_norm(I1, center[None], size[None])[0]
    pos_ex, n_pos = jax.lax.cond(
        learn, lambda: _push(st.pos_ex, st.n_pos, cur), lambda: (st.pos_ex, st.n_pos)
    )
    # N-expert: high-fern-score windows far from the target are negatives
    d = jnp.linalg.norm(centers - center[None], axis=1)
    hard_neg = jnp.argmax(jnp.where((d > (size[0] + size[1])) & pass1, fern_p, -1.0))
    neg_patch = patches[hard_neg]
    neg_ex, n_neg = jax.lax.cond(
        learn, lambda: _push(st.neg_ex, st.n_neg, neg_patch), lambda: (st.neg_ex, st.n_neg)
    )
    counts = jax.lax.cond(
        learn,
        lambda: _fern_update(
            _fern_update(st.counts, I1, center[None], size[None], bank, True),
            I1, centers[hard_neg][None], sizes[hard_neg][None], bank, False),
        lambda: st.counts,
    )
    post = (counts[..., 0] + 1.0) / (counts.sum(-1) + 2.0)
    tracking = trk_ok | use_det
    return TldState(new_box, post, counts, pos_ex, neg_ex, n_pos, n_neg, tracking), conf
