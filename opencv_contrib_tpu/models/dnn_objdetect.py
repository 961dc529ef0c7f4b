"""Anchor-grid convolutional object detection (SqueezeDet-class).

Parity target: dnn_objdetect/src/core_detect.cpp (InferBbox: ConvDet output
tensor -> anchor deltas -> sigmoid confidence x softmax class ->
threshold + NMS) and the SqueezeDet head the module ships configs for.

TPU-first: a small all-conv flax backbone (fire-module-lite) with a ConvDet
head predicting (conf, class logits, box deltas) per anchor per cell; the
whole decode (delta -> box, confidence, NMS suppression matrix) is batched
jnp — NMS uses the O(N^2) IoU-matrix greedy formulation, which on TPU is
one matmul-shaped op instead of the reference's sequential loop.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class FireLite(nn.Module):
    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1))(x))
        e1 = nn.Conv(self.expand, (1, 1))(s)
        e3 = nn.Conv(self.expand, (3, 3), padding="SAME")(s)
        return nn.relu(jnp.concatenate([e1, e3], axis=-1))


class SqueezeDetLite(nn.Module):
    """Backbone stride 8; ConvDet head outputs (A * (5 + n_classes)) maps:
    per anchor [conf, dy, dx, dh, dw, class logits...]."""

    n_classes: int = 3
    n_anchors: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(16, (3, 3), strides=2, padding="SAME")(x))
        h = FireLite(8, 16)(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = FireLite(16, 32)(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = FireLite(16, 32)(h)
        out = nn.Conv(self.n_anchors * (5 + self.n_classes), (3, 3), padding="SAME")(h)
        N, Hc, Wc, _ = out.shape
        return out.reshape(N, Hc, Wc, self.n_anchors, 5 + self.n_classes)


def make_anchors(scales=(12.0, 24.0, 48.0)):
    """Square anchors (h, w) per cell (the reference reads anchor shapes
    from the model config)."""
    return jnp.asarray([[s, s] for s in scales], jnp.float32)


@partial(jax.jit, static_argnames=("stride",))
def decode(head, anchors, stride: int = 8):
    """ConvDet tensor -> (boxes [y0,x0,y1,x1], conf, class probs) for every
    anchor position (InferBbox::filter semantics, batched).

    head (Hc, Wc, A, 5+C) for ONE image."""
    Hc, Wc, A, _ = head.shape
    conf = jax.nn.sigmoid(head[..., 0])
    deltas = head[..., 1:5]
    cls = jax.nn.softmax(head[..., 5:], axis=-1)
    cy = (jnp.arange(Hc, dtype=jnp.float32)[:, None, None] + 0.5) * stride
    cx = (jnp.arange(Wc, dtype=jnp.float32)[None, :, None] + 0.5) * stride
    ah = anchors[None, None, :, 0]
    aw = anchors[None, None, :, 1]
    by = cy + deltas[..., 0] * ah
    bx = cx + deltas[..., 1] * aw
    bh = ah * jnp.exp(jnp.clip(deltas[..., 2], -4, 4))
    bw = aw * jnp.exp(jnp.clip(deltas[..., 3], -4, 4))
    boxes = jnp.stack([by - bh / 2, bx - bw / 2, by + bh / 2, bx + bw / 2], axis=-1)
    return boxes.reshape(-1, 4), conf.reshape(-1), cls.reshape(-1, cls.shape[-1])


@partial(jax.jit, static_argnames=("top_k",))
def nms(boxes, scores, iou_thresh: float = 0.4, top_k: int = 32):
    """Greedy NMS via the IoU suppression matrix: iterate top_k times,
    each time taking the best remaining box and masking its overlaps.
    Static shapes; returns (indices (top_k,), valid (top_k,))."""
    y0, x0, y1, x1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(y1 - y0, 0) * jnp.maximum(x1 - x0, 0)
    iy0 = jnp.maximum(y0[:, None], y0[None])
    ix0 = jnp.maximum(x0[:, None], x0[None])
    iy1 = jnp.minimum(y1[:, None], y1[None])
    ix1 = jnp.minimum(x1[:, None], x1[None])
    inter = jnp.maximum(iy1 - iy0, 0) * jnp.maximum(ix1 - ix0, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None] - inter, 1e-9)

    def body(carry, _):
        alive, out_scores = carry
        s = jnp.where(alive, out_scores, -jnp.inf)
        i = jnp.argmax(s)
        ok = s[i] > -jnp.inf
        suppress = iou[i] > iou_thresh
        alive = alive & ~suppress & (jnp.arange(alive.shape[0]) != i)
        return (alive, out_scores), (i, ok)

    (_, _), (idx, valid) = jax.lax.scan(
        body, (jnp.ones_like(scores, bool), scores), None, length=top_k
    )
    return idx, valid


def detect(params, model: SqueezeDetLite, img, anchors, conf_thresh: float = 0.5,
           iou_thresh: float = 0.4, stride: int = 8):
    """Full detection for one grayscale/RGB image (H, W[, C]). Returns
    (boxes, scores, class_ids) numpy arrays."""
    x = jnp.asarray(img, jnp.float32)
    if x.ndim == 2:
        x = x[..., None]
    head = model.apply(params, x[None])[0]
    boxes, conf, cls = decode(head, anchors, stride=stride)
    score = conf * cls.max(-1)
    cid = cls.argmax(-1)
    idx, valid = nms(boxes, jnp.where(score >= conf_thresh, score, -jnp.inf), iou_thresh)
    idxn, validn = np.asarray(idx), np.asarray(valid)
    sel = idxn[validn]
    sn = np.asarray(score)[sel]
    keep = sn >= conf_thresh
    return np.asarray(boxes)[sel][keep], sn[keep], np.asarray(cid)[sel][keep]


def detection_loss(params, model, imgs, tgt_conf, tgt_boxes, tgt_cls, anchors, stride: int = 8):
    """SqueezeDet training loss: conf BCE + masked box L2 + masked class CE.
    tgt_conf (N, Hc, Wc, A) in {0,1}; tgt_boxes (N, Hc, Wc, A, 4) deltas;
    tgt_cls (N, Hc, Wc, A) int."""
    head = model.apply(params, imgs)
    conf = head[..., 0]
    bce = optax.sigmoid_binary_cross_entropy(conf, tgt_conf).mean()
    m = tgt_conf[..., None]
    box_l2 = ((head[..., 1:5] - tgt_boxes) ** 2 * m).sum() / jnp.maximum(m.sum(), 1)
    ce = optax.softmax_cross_entropy_with_integer_labels(head[..., 5:], tgt_cls)
    ce = (ce * tgt_conf).sum() / jnp.maximum(tgt_conf.sum(), 1)
    return bce + 5.0 * box_l2 + ce


@partial(jax.jit, static_argnames=("model",))
def train_step(params, opt_state, model, imgs, tgt_conf, tgt_boxes, tgt_cls, anchors, tx_hash=None):
    # optax adam state threaded by the caller
    loss, grads = jax.value_and_grad(detection_loss)(params, model, imgs, tgt_conf, tgt_boxes, tgt_cls, anchors)
    updates, opt_state = _TX.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


_TX = optax.adam(1e-3)


def init(key, model: SqueezeDetLite, img_hw=(96, 96), channels: int = 1):
    params = model.init(key, jnp.zeros((1, *img_hw, channels)))
    return params, _TX.init(params)
