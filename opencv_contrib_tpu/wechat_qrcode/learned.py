"""Learned QR detection + super-resolution stages, trained in-repo.

The reference wechat_qrcode pipeline is SSD CNN detect -> SR CNN ->
decode (wechat_qrcode/src/detector/ssd_detector.cpp, super_scale.cpp),
shipping both CNNs as binary caffemodels. Here both stages are TRAINED
IN-REPO (the CRNN/siamese recipe) on rendered QR codes:

- QrDetectorNet: a tiny fully-convolutional CenterNet-lite (stride-8
  objectness heatmap + center offset + log-size) trained on codes
  composited onto procedural backgrounds under blur/noise/downscaling.
- SR stage: the dnn_superres ESPCN x2 trained on degraded QR crops
  (sharp-edge statistics, where a generic bicubic blurs module borders).

detect_and_decode_learned composes detect -> crop -> (SR if small) ->
classical decode, with a full-frame classical fallback — recovering codes
whose module pitch (<3 px) or blur defeats the classical finder scan.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from opencv_contrib_tpu.wechat_qrcode import qr as qrmod

DET_SIZE = 128  # detector input resolution
STRIDE = 8


class QrDetectorNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # (N, 128, 128, 1)
        for ch in (8, 16, 32):
            x = nn.relu(nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME")(x))
        heat = nn.Conv(1, (1, 1))(x)  # (N, 16, 16, 1) logits
        off = nn.Conv(2, (1, 1))(x)  # center offset in cells
        size = nn.Conv(1, (1, 1))(x)  # log(box side / 32 px)
        return heat, off, size


class QrDetector(NamedTuple):
    params: dict

    def detect(self, img: np.ndarray):
        """Best QR box on a gray [0,1] image -> (y0, x0, y1, x1) in source
        pixels + score (sigmoid objectness)."""
        H, W = img.shape
        x = jax.image.resize(jnp.asarray(img, jnp.float32),
                             (DET_SIZE, DET_SIZE), "bilinear")
        heat, off, size = QrDetectorNet().apply(
            self.params, x[None, ..., None])
        h = np.asarray(heat[0, ..., 0])
        cy, cx = np.unravel_index(np.argmax(h), h.shape)
        score = 1.0 / (1.0 + np.exp(-h[cy, cx]))
        o = np.asarray(off[0, cy, cx])
        s = float(np.exp(np.asarray(size[0, cy, cx, 0]))) * 32.0
        ctr_y = (cy + 0.5 + o[0]) * STRIDE
        ctr_x = (cx + 0.5 + o[1]) * STRIDE
        sy, sx = H / DET_SIZE, W / DET_SIZE
        half = s / 2.0
        return (int((ctr_y - half) * sy), int((ctr_x - half) * sx),
                int((ctr_y + half) * sy), int((ctr_x + half) * sx)), score


# ---------------------------------------------------------------------------
# training-scene synthesis

def _background(rng, size=DET_SIZE):
    g = rng.standard_normal((size // 8, size // 8)).astype(np.float32)
    bg = np.asarray(jax.image.resize(jnp.asarray(g), (size, size),
                                     "bilinear"))
    bg = 0.5 + 0.25 * bg / max(np.abs(bg).max(), 1e-6)
    return np.clip(bg, 0, 1)


def _blur(img, sigma):
    if sigma <= 0:
        return img
    r = max(1, int(2 * sigma))
    t = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k /= k.sum()
    out = np.apply_along_axis(lambda m: np.convolve(m, k, "same"), 0, img)
    return np.apply_along_axis(
        lambda m: np.convolve(m, k, "same"), 1, out).astype(np.float32)


def make_training_scene(rng, degrade=True):
    """One composited detector training image + (ctr_y, ctr_x, side)."""
    text = "".join(chr(rng.integers(65, 91)) for _ in range(rng.integers(4, 12)))
    mod = qrmod.encode(text, mask_id=int(rng.integers(0, 8)))
    n = mod.shape[0]
    side = int(rng.integers(40, 100))
    scale = max(1, side // (n + 8))
    patch = qrmod.render(mod, scale=scale, border=2).astype(np.float32)
    ph = patch.shape[0]
    img = _background(rng)
    y0 = int(rng.integers(0, DET_SIZE - ph))
    x0 = int(rng.integers(0, DET_SIZE - ph))
    img[y0:y0 + ph, x0:x0 + ph] = patch
    if degrade:
        if rng.random() < 0.6:
            img = _blur(img, rng.uniform(0.5, 1.5))
        img = np.clip(img + rng.standard_normal(img.shape) * rng.uniform(0, 0.06),
                      0, 1).astype(np.float32)
    return img, (y0 + ph / 2.0, x0 + ph / 2.0, float(ph))


def train_detector(n_steps: int = 300, batch: int = 16,
                   seed: int = 0, lr: float = 2e-3) -> QrDetector:
    """Train the detector head (ssd_detector.cpp role)."""
    rng = np.random.default_rng(seed)
    net = QrDetectorNet()
    params = net.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, DET_SIZE, DET_SIZE, 1)))
    tx = optax.adam(lr)
    opt = tx.init(params)
    G = DET_SIZE // STRIDE

    @jax.jit
    def step(params, opt, imgs, targets):
        def loss_fn(p):
            heat, off, size = net.apply(p, imgs)
            cy, cx, side = targets[:, 0], targets[:, 1], targets[:, 2]
            gy = jnp.clip((cy / STRIDE).astype(jnp.int32), 0, G - 1)
            gx = jnp.clip((cx / STRIDE).astype(jnp.int32), 0, G - 1)
            tgt = jnp.zeros((imgs.shape[0], G, G))
            tgt = tgt.at[jnp.arange(imgs.shape[0]), gy, gx].set(1.0)
            bce = optax.sigmoid_binary_cross_entropy(heat[..., 0], tgt)
            # upweight the single positive cell
            w = 1.0 + tgt * (G * G - 1.0)
            l_heat = jnp.mean(bce * w)
            b = jnp.arange(imgs.shape[0])
            oy = cy / STRIDE - (gy + 0.5)
            ox = cx / STRIDE - (gx + 0.5)
            l_off = jnp.mean(jnp.abs(off[b, gy, gx, 0] - oy)
                             + jnp.abs(off[b, gy, gx, 1] - ox))
            l_size = jnp.mean(jnp.abs(size[b, gy, gx, 0]
                                      - jnp.log(side / 32.0)))
            return l_heat + 0.5 * l_off + 0.5 * l_size

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(n_steps):
        imgs, tgts = [], []
        for _ in range(batch):
            im, t = make_training_scene(rng)
            imgs.append(im)
            tgts.append(t)
        params, opt, loss = step(
            params, opt, jnp.asarray(np.stack(imgs))[..., None],
            jnp.asarray(np.asarray(tgts, np.float32)))
    return QrDetector(params)


def train_qr_sr(n_steps: int = 200, batch: int = 8, seed: int = 0):
    """ESPCN x2 trained on degraded QR crops (super_scale.cpp role)."""
    from opencv_contrib_tpu.models.dnn_superres import DnnSuperRes

    sr = DnnSuperRes("espcn", scale=2, seed=seed)
    sr.init_training(lr=2e-3)
    rng = np.random.default_rng(seed)
    for _ in range(n_steps):
        lrs, hrs = [], []
        for _ in range(batch):
            text = "".join(chr(rng.integers(65, 91)) for _ in range(6))
            mod = qrmod.encode(text, mask_id=int(rng.integers(0, 8)))
            hr = qrmod.render(mod, scale=4, border=2).astype(np.float32)
            hr = hr[:96, :96] if hr.shape[0] >= 96 else np.pad(
                hr, ((0, 96 - hr.shape[0]), (0, 96 - hr.shape[1])),
                constant_values=1.0)
            lr_img = np.asarray(jax.image.resize(jnp.asarray(hr), (48, 48),
                                                 "bilinear"))
            lr_img = _blur(lr_img, float(rng.uniform(0.0, 0.8)))
            lrs.append(lr_img)
            hrs.append(hr)
        sr.train_step(jnp.asarray(np.stack(lrs))[..., None],
                      jnp.asarray(np.stack(hrs))[..., None])
    return sr


# ---------------------------------------------------------------------------
# composed pipeline

def detect_and_decode_learned(img, detector: QrDetector, sr=None,
                              min_crop_px: int = 120):
    """CNN detect -> crop -> (SR x2 when the crop is small) -> classical
    decode, with a full-frame classical fallback
    (WeChatQRCode::detectAndDecode contract, wechat_qrcode.hpp:24)."""
    img = np.asarray(img, np.float32)
    box, score = detector.detect(img)
    H, W = img.shape
    y0, x0, y1, x1 = box
    m = int(0.15 * max(y1 - y0, x1 - x0))
    y0, x0 = max(0, y0 - m), max(0, x0 - m)
    y1, x1 = min(H, y1 + m), min(W, x1 + m)
    if score > 0.3 and y1 - y0 > 10 and x1 - x0 > 10:
        crop = img[y0:y1, x0:x1]
        if sr is not None and max(crop.shape) < min_crop_px:
            crop = np.asarray(sr.upsample(crop))
        text, _ = qrmod.detect_and_decode(crop)
        if text is not None:
            return text
        if sr is not None and max(crop.shape) < 2 * min_crop_px:
            crop2 = np.asarray(sr.upsample(crop))
            text, _ = qrmod.detect_and_decode(crop2)
            if text is not None:
                return text
    return qrmod.detect_and_decode(img)[0]
