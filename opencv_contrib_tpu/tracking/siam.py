"""Siamese deep tracker (GOTURN / DaSiamRPN class).

Reference anchors (tracking):
- src/gtrTracker.cpp + gtrUtils.cpp — GOTURN: previous-frame target crop +
  current-frame search crop through a CNN -> new box (loads a Caffe model)
- DaSiamRPN sample/tracker (tracking/samples, main-repo video tracking API):
  siamese template/search correlation with a learned backbone

The reference downloads pretrained networks; zero egress here, so the
backbone TRAINS IN-REPO on synthetic translated/augmented crops — the same
offline-correlation objective SiamFC uses (template feature cross-correlated
over the search feature, Gaussian peak label at the true offset).

TPU-first: the cross-correlation IS `lax.conv` with the template feature as
the kernel (MXU); training batches are one jit; tracking update is one fused
forward. No per-frame host logic beyond the crop bookkeeping.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from opencv_contrib_tpu.ops.image import sample_bilinear


TEMPLATE = 32  # template crop side
SEARCH = 64    # search crop side


class SiamBackbone(nn.Module):
    """Small fully-convolutional embedding (stride 4 total)."""

    features: int = 32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1)
        x = nn.Conv(16, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3))(x)
        return x


def xcorr(search_feat: jnp.ndarray, templ_feat: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlate template features over search features.
    search (Hs, Ws, C), template (Ht, Wt, C) -> (Hs-Ht+1, Ws-Wt+1)."""
    x = search_feat[None].transpose(0, 3, 1, 2)  # NCHW
    k = templ_feat.transpose(2, 0, 1)[None]      # OIHW with O=1
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")
    return out[0, 0]


def _crop_resize(img, center_yx, side, out_side):
    ys = jnp.linspace(-side / 2, side / 2, out_side) + center_yx[0]
    xs = jnp.linspace(-side / 2, side / 2, out_side) + center_yx[1]
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return sample_bilinear(img, yy, xx)


class SiamState(NamedTuple):
    templ_feat: jnp.ndarray
    center: jnp.ndarray  # (2,) y, x
    size: jnp.ndarray    # (2,) h, w


@partial(jax.jit, static_argnames=("apply_fn",))
def _embed(params, apply_fn, patch):
    f = apply_fn({"params": params}, patch[None, ..., None])[0]
    return f - f.mean(axis=(0, 1), keepdims=True)


def siam_init(params, apply_fn, img, bbox) -> SiamState:
    """bbox = (y, x, h, w). Extracts and embeds the template."""
    y, x, h, w = [float(v) for v in bbox]
    center = jnp.array([y + h / 2.0, x + w / 2.0])
    side = float(np.sqrt(h * w) * 1.5)
    patch = _crop_resize(jnp.asarray(img, jnp.float32), center, side, TEMPLATE)
    feat = _embed(params, apply_fn, patch)
    return SiamState(templ_feat=feat, center=center,
                     size=jnp.array([h, w], jnp.float32))


@partial(jax.jit, static_argnames=("apply_fn",))
def _track_step(params, apply_fn, templ_feat, center, size, img):
    side = jnp.sqrt(size[0] * size[1]) * 1.5 * (SEARCH / TEMPLATE)
    patch = _crop_resize(img, center, side, SEARCH)
    sf = _embed(params, apply_fn, patch)
    resp = xcorr(sf, templ_feat)
    Hr, Wr = resp.shape
    # cosine window against drift
    wy = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(Hr) / (Hr - 1))
    wx = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(Wr) / (Wr - 1))
    resp = resp * (0.7 + 0.3 * wy[:, None] * wx[None, :])
    idx = jnp.argmax(resp)
    py, px = idx // Wr, idx % Wr
    # feature-grid displacement -> image pixels (backbone stride 4)
    stride = side / SEARCH * 4.0
    dy = (py - (Hr - 1) / 2.0) * stride
    dx = (px - (Wr - 1) / 2.0) * stride
    score = resp[py, px]
    return center + jnp.array([dy, dx]), score


def siam_update(params, apply_fn, state: SiamState, img):
    """Track into the next frame; returns (new_state, bbox, score)."""
    center, score = _track_step(params, apply_fn, state.templ_feat,
                                state.center, state.size,
                                jnp.asarray(img, jnp.float32))
    new = SiamState(templ_feat=state.templ_feat, center=center, size=state.size)
    h, w = float(state.size[0]), float(state.size[1])
    bbox = (float(center[0]) - h / 2, float(center[1]) - w / 2, h, w)
    return new, bbox, float(score)


# ---------------------------------------------------------------------------
# In-repo training (SiamFC-style offline correlation objective)
# ---------------------------------------------------------------------------


def _synth_pair(rng, texture_side=16):
    """One (template_patch, search_patch, label_yx) training triple: a random
    textured object pasted on random clutter; the search crop shows it at a
    random offset."""
    obj = rng.uniform(0, 1, (texture_side, texture_side)).astype(np.float32)
    t = np.zeros((TEMPLATE, TEMPLATE), np.float32)
    t += rng.uniform(0, 0.3, t.shape).astype(np.float32)
    o = (TEMPLATE - texture_side) // 2
    t[o:o + texture_side, o:o + texture_side] = obj

    s = rng.uniform(0, 0.3, (SEARCH, SEARCH)).astype(np.float32)
    # clutter: smooth distractor blobs (bright but texture-free, so the
    # embedding must use the object's texture, not just brightness)
    for _ in range(3):
        dy, dx = rng.integers(0, SEARCH - texture_side, 2)
        s[dy:dy + texture_side, dx:dx + texture_side] = rng.uniform(0.3, 0.8)
    max_off = (SEARCH - TEMPLATE) // 2 - 2
    off = rng.integers(-max_off, max_off + 1, 2)
    cy, cx = SEARCH // 2 + off[0], SEARCH // 2 + off[1]
    y0, x0 = cy - texture_side // 2, cx - texture_side // 2
    s[y0:y0 + texture_side, x0:x0 + texture_side] = obj
    return t, s, np.array(off, np.float32)


def _loss(params, apply_fn, templs, searches, offs):
    tf = jax.vmap(lambda p: _embed(params, apply_fn, p))(templs)
    sf = jax.vmap(lambda p: _embed(params, apply_fn, p))(searches)
    resps = jax.vmap(xcorr)(sf, tf)  # (B, Hr, Wr)
    B, Hr, Wr = resps.shape
    # Gaussian label centered at the true offset (backbone stride 4)
    yy = jnp.arange(Hr)[None, :, None] - ((Hr - 1) / 2.0 + offs[:, 0:1, None] / 4.0)
    xx = jnp.arange(Wr)[None, None, :] - ((Wr - 1) / 2.0 + offs[:, 1:2, None].transpose(0, 2, 1) / 4.0)
    label = jnp.exp(-(yy ** 2 + xx ** 2) / 2.0)
    logp = jax.nn.log_softmax(resps.reshape(B, -1), -1)
    label = label.reshape(B, -1)
    label = label / label.sum(-1, keepdims=True)
    return -(label * logp).sum(-1).mean()


def train_siam(n_steps: int = 200, batch: int = 16, lr: float = 3e-3,
               seed: int = 0, features: int = 32):
    """Train the backbone on synthetic pairs; returns (model, params)."""
    model = SiamBackbone(features=features)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, SEARCH, SEARCH, 1)))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(_loss), static_argnames=("apply_fn",))

    for _ in range(n_steps):
        trip = [_synth_pair(rng) for _ in range(batch)]
        templs = jnp.asarray(np.stack([t for t, _, _ in trip]))
        searches = jnp.asarray(np.stack([s for _, s, _ in trip]))
        offs = jnp.asarray(np.stack([o for _, _, o in trip]))
        _, g = grad_fn(params, model.apply, templs, searches, offs)
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)
    return model, params
