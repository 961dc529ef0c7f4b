"""Learned structured edge detector (trained in-repo).

Reference anchor: ximgproc/src/structured_edge_detection.cpp:359-366
(StructuredEdgeDetection::detectEdges) — the reference evaluates a shipped
random-forest model over 13-channel patch features. Re-designed TPU-first:
the same channel-feature family (multi-scale gradient magnitude + soft
orientation channels + intensity) with 3x3 spatial context gathered by
SHIFTED channel stacking, scored by a small MLP — dense MXU matmuls per
pixel instead of per-tree pointer chasing; the model is TRAINED HERE on
synthetic boundary supervision (the in-repo training recipe used for
VGG/BoostDesc/CRNN), not shipped as a binary blob.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from opencv_contrib_tpu.ops import filters

N_ORIENT = 4


def _channels(img: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) per-pixel channels: intensity, 2-scale gradient magnitude,
    4 soft orientation channels (the reference's gradient channel family)."""
    chans = [img]
    for s in (1.0, 2.0):
        g = filters.gaussian_blur(img, s)
        gy, gx = filters.gradients(g)
        mag = jnp.sqrt(gy * gy + gx * gx)
        chans.append(mag)
        if s == 1.0:
            ang = jnp.arctan2(gy, gx)
            for k in range(N_ORIENT):
                a0 = -jnp.pi + (2 * jnp.pi) * k / N_ORIENT
                w = jnp.cos(ang - a0) ** 2
                chans.append(mag * w)
    return jnp.stack(chans)  # (7, H, W)


_OFFSETS = [(dy, dx) for dy in (-2, 0, 2) for dx in (-2, 0, 2)]


def _features(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, D) feature rows: channels at 9 shifted context positions."""
    ch = _channels(img)  # (C, H, W)
    feats = [jnp.roll(ch, (dy, dx), axis=(1, 2)) for dy, dx in _OFFSETS]
    F = jnp.concatenate(feats, axis=0)  # (9C, H, W)
    return jnp.moveaxis(F, 0, -1)


def _predict_map(params, img):
    f = _features(img)
    h = jax.nn.relu(f @ params["W1"] + params["b1"])
    return jax.nn.sigmoid(h @ params["W2"] + params["b2"])[..., 0]


def _synthetic_scene(rng, H=96, W=96):
    """Random ellipse regions with distinct intensities AND intra-region
    texture (stripes/noise); ground truth = region boundaries only. The
    texture is the point: plain gradient detectors fire on it, the learned
    model must suppress it (the structured forest's actual value on
    natural images)."""
    lab = np.zeros((H, W), np.int32)
    img = np.full((H, W), rng.uniform(0.2, 0.5), np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for i in range(1, rng.integers(3, 6)):
        cy, cx = rng.uniform(10, H - 10), rng.uniform(10, W - 10)
        a, b = rng.uniform(8, 28, 2)
        th = rng.uniform(0, np.pi)
        ry = (yy - cy) * np.cos(th) + (xx - cx) * np.sin(th)
        rx = -(yy - cy) * np.sin(th) + (xx - cx) * np.cos(th)
        m = (ry / a) ** 2 + (rx / b) ** 2 < 1
        lab[m] = i
        img[m] = rng.uniform(0.1, 0.9)
    # per-region texture: oriented stripes at random frequency/phase
    for i in range(int(lab.max()) + 1):
        m = lab == i
        if not m.any() or rng.random() < 0.3:
            continue
        fth = rng.uniform(0, np.pi)
        freq = rng.uniform(0.4, 1.2)
        phase = rng.uniform(0, 2 * np.pi)
        stripes = 0.08 * np.sin(freq * (yy * np.cos(fth) + xx * np.sin(fth))
                                + phase)
        img = np.where(m, img + stripes, img)
    edge = np.zeros((H, W), bool)
    edge[:-1] |= lab[:-1] != lab[1:]
    edge[:, :-1] |= lab[:, :-1] != lab[:, 1:]
    # photometric nuisance
    img = img + rng.normal(0, 0.02, img.shape)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(img, rng.uniform(0.5, 1.2))
    return img.astype(np.float32), edge


def train(n_images: int = 40, steps: int = 400, lr: float = 3e-3,
          hidden: int = 32, seed: int = 0):
    """Train the edge MLP on synthetic boundary supervision. Returns the
    parameter pytree for structured_edges."""
    rng = np.random.default_rng(seed)
    imgs, gts = [], []
    for _ in range(n_images):
        im, ed = _synthetic_scene(rng)
        imgs.append(im)
        gts.append(ed)
    imgs = jnp.asarray(np.stack(imgs))
    # soft targets: dilate GT 1px so near-boundary pixels don't fight
    gt = np.stack(gts)
    near = gt.copy()
    for dy, dx in ((0, 1), (1, 0), (0, -1), (-1, 0)):
        near |= np.roll(gt, (dy, dx), (1, 2))
    target = jnp.asarray(gt.astype(np.float32))
    weight = jnp.asarray(np.where(gt, 6.0, np.where(near, 0.0, 1.0))
                         .astype(np.float32))  # ignore the 1px halo

    D = 7 * len(_OFFSETS)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = {
        "W1": jax.random.normal(k1, (D, hidden)) * np.sqrt(2.0 / D),
        "b1": jnp.zeros(hidden),
        "W2": jax.random.normal(k2, (hidden, 1)) * np.sqrt(2.0 / hidden),
        "b2": jnp.zeros(1),
    }

    def loss_fn(p):
        pred = jax.vmap(lambda im: _predict_map(p, im))(imgs)
        bce = -(target * jnp.log(pred + 1e-7)
                + (1 - target) * jnp.log(1 - pred + 1e-7))
        return (bce * weight).mean()

    @jax.jit
    def step(p, m, v, t):
        g = jax.grad(loss_fn)(p)
        m = jax.tree_util.tree_map(lambda a, b: 0.9 * a + 0.1 * b, m, g)
        v = jax.tree_util.tree_map(lambda a, b: 0.999 * a + 0.001 * b * b, v, g)
        mh = jax.tree_util.tree_map(lambda a: a / (1 - 0.9 ** t), m)
        vh = jax.tree_util.tree_map(lambda a: a / (1 - 0.999 ** t), v)
        p = jax.tree_util.tree_map(
            lambda pp, a, b: pp - lr * a / (jnp.sqrt(b) + 1e-8), p, mh, vh)
        return p, m, v

    m = jax.tree_util.tree_map(jnp.zeros_like, params)
    v = jax.tree_util.tree_map(jnp.zeros_like, params)
    for t in range(1, steps + 1):
        params, m, v = step(params, m, v, t)
    return params


_DEFAULT_PARAMS = None


def structured_edges(img: jnp.ndarray, params=None) -> jnp.ndarray:
    """Learned edge probability map in [0, 1]
    (StructuredEdgeDetection::detectEdges contract,
    structured_edge_detection.hpp:97). Trains the default model on first
    use (cached in-process; pass params to reuse across processes)."""
    global _DEFAULT_PARAMS
    if params is None:
        if _DEFAULT_PARAMS is None:
            _DEFAULT_PARAMS = train()
        params = _DEFAULT_PARAMS
    return _predict_map(params, jnp.asarray(img, jnp.float32))


def edges_nms(e: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Orientation-selective thinning of an edge map (edgesNms role)."""
    gy, gx = filters.gradients(filters.gaussian_blur(img, 1.0))
    ang = jnp.arctan2(gy, gx)
    q = jnp.round(ang / (jnp.pi / 4)).astype(jnp.int32) % 4
    shifts = [(0, 1), (1, 1), (1, 0), (1, -1)]
    nms = e
    for k, (dy, dx) in enumerate(shifts):
        n1 = jnp.roll(e, (dy, dx), (0, 1))
        n2 = jnp.roll(e, (-dy, -dx), (0, 1))
        keep = (e >= n1) & (e >= n2)
        nms = jnp.where((q == k) & ~keep, 0.0, nms)
    return nms
