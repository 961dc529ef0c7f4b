"""CRNN-class holistic text recognizer (flax) with CTC training.

Reference anchor: text/src/ocr_holistic.cpp (OCRHolisticWordRecognizer —
a word-spotting CNN) and the TextRecognitionModel-era CRNN heads the text
module delegates to cv::dnn for. The reference loads pretrained Caffe
models; zero-egress here, so the model TRAINS IN-REPO on synthetic text
rendered from the built-in glyph bank (text.ocr.render_text).

TPU-first: convolutions and the GRU recurrence are batched under one jit;
CTC loss is optax.ctc_loss (blank id 0); decoding is greedy collapse.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from opencv_contrib_tpu.text.ocr import VOCAB, render_text

N_CLASSES = len(VOCAB) + 1  # + blank at id 0


class CRNN(nn.Module):
    """Small conv + bidirectional GRU + per-column logits."""

    features: int = 48

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 1)
        x = nn.Conv(16, (3, 3), strides=(2, 1))(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        B, H, W, C = x.shape
        cols = x.transpose(0, 2, 1, 3).reshape(B, W, H * C)
        cols = nn.Dense(self.features)(cols)
        fwd = nn.RNN(nn.GRUCell(self.features))(cols)
        bwd = nn.RNN(nn.GRUCell(self.features), reverse=True)(cols)
        h = jnp.concatenate([fwd, bwd], -1)
        return nn.Dense(N_CLASSES)(h)  # (B, W, N_CLASSES)


def encode_label(s: str, max_len: int):
    ids = [VOCAB.index(c) + 1 for c in s.upper() if c in VOCAB]
    pad = max_len - len(ids)
    return np.array(ids + [0] * pad, np.int32), np.array([0.0] * len(ids) + [1.0] * pad, np.float32)


def make_batch(words, H: int, W: int, max_len: int, rng, noise: float = 0.05):
    imgs = np.zeros((len(words), H, W, 1), np.float32)
    labels = np.zeros((len(words), max_len), np.int32)
    lpad = np.ones((len(words), max_len), np.float32)
    for i, w in enumerate(words):
        img = render_text(w, scale=2, noise=noise, rng=rng)
        h, ww = img.shape
        imgs[i, :min(h, H), :min(ww, W), 0] = img[:H, :W]
        labels[i], lpad[i] = encode_label(w, max_len)
    return jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(lpad)


@partial(jax.jit, static_argnames=("apply_fn",))
def _loss(params, apply_fn, imgs, labels, lpad):
    logits = apply_fn({"params": params}, imgs)
    logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)
    per = optax.ctc_loss(logits, logit_pad, labels, lpad)
    return per.mean()


def train_crnn(words, n_steps: int = 300, H: int = 20, W: int = 96,
               max_len: int = 8, lr: float = 3e-3, seed: int = 0,
               features: int = 48):
    """Train on synthetic renders of `words`; returns (model, params)."""
    model = CRNN(features=features)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    imgs, labels, lpad = make_batch(words, H, W, max_len, rng)
    params = model.init(key, imgs)["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.grad(_loss), static_argnames=("apply_fn",))

    for step in range(n_steps):
        if len(words) <= 16:
            # full-batch: deterministic, convergence independent of sampling
            imgs, labels, lpad = make_batch(words, H, W, max_len, rng)
        else:
            batch_words = [words[i] for i in rng.integers(0, len(words), 16)]
            imgs, labels, lpad = make_batch(batch_words, H, W, max_len, rng)
        g = grad_fn(params, model.apply, imgs, labels, lpad)
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)
    return model, params


def ctc_greedy_decode(logits: jnp.ndarray) -> list[str]:
    """Greedy CTC decode of (B, T, C) logits -> strings."""
    ids = np.asarray(jnp.argmax(logits, -1))
    out = []
    for row in ids:
        s = []
        prev = -1
        for t in row:
            if t != prev and t != 0:
                s.append(VOCAB[t - 1])
            prev = t
        out.append("".join(s))
    return out


def recognize(model, params, imgs: jnp.ndarray) -> list[str]:
    """(B, H, W, 1) -> decoded strings (OCRHolisticWordRecognizer::run)."""
    logits = model.apply({"params": params}, imgs)
    return ctc_greedy_decode(logits)
