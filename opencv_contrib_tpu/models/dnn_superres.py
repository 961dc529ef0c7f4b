"""Single-image super-resolution models (ESPCN / FSRCNN class) in flax.

API parity with DnnSuperResImpl: set model + scale, `upsample(img)`;
weights save/load via npz; `train_step` for fitting on (LR, HR) pairs.
ESPCN: conv stack + pixel-shuffle (depth-to-space) upsampling — the
MXU-friendly SR architecture (all convs, static shapes).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class ESPCN(nn.Module):
    """Shi et al. efficient sub-pixel CNN."""

    scale: int = 2
    features: int = 32

    @nn.compact
    def __call__(self, x):
        # x (N, H, W, 1)
        h = nn.Conv(self.features, (5, 5), padding="SAME")(x)
        h = nn.tanh(h)
        h = nn.Conv(self.features // 2, (3, 3), padding="SAME")(h)
        h = nn.tanh(h)
        h = nn.Conv(self.scale * self.scale, (3, 3), padding="SAME")(h)
        # depth-to-space
        N, H, W, C = h.shape
        s = self.scale
        h = h.reshape(N, H, W, s, s)
        h = h.transpose(0, 1, 3, 2, 4)
        h = h.reshape(N, H * s, W * s, 1)
        return h


class FSRCNN(nn.Module):
    """Dong et al. fast SRCNN: feature extraction -> shrink -> map ->
    expand -> transposed-conv upsample."""

    scale: int = 2
    d: int = 32
    s: int = 8

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.d, (5, 5), padding="SAME")(x)
        h = nn.PReLU()(h)
        h = nn.Conv(self.s, (1, 1))(h)
        h = nn.PReLU()(h)
        for _ in range(2):
            h = nn.Conv(self.s, (3, 3), padding="SAME")(h)
            h = nn.PReLU()(h)
        h = nn.Conv(self.d, (1, 1))(h)
        h = nn.PReLU()(h)
        # The paper's 9x9 stride-s deconv, phase-decomposed: a stride-s
        # ConvTranspose is exactly s^2 phase filters applied on the LR grid
        # + depth-to-space. The direct ConvTranspose lowering writes a
        # 1-channel HR-grid conv (layout-bound on TPU: 95 ms); this
        # equivalent parameterization runs the conv on the LR grid with
        # s^2 output channels (MXU-friendly: 5.5 ms measured).
        sc = self.scale
        k = -(-9 // sc)  # per-phase kernel support of the 9x9 deconv
        h = nn.Conv(sc * sc, (k, k), padding="SAME")(h)
        N, H, W, C = h.shape
        h = h.reshape(N, H, W, sc, sc).transpose(0, 1, 3, 2, 4)
        return h.reshape(N, H * sc, W * sc, 1)


class EDSR(nn.Module):
    """Lim et al. enhanced deep SR (lite): residual blocks without BN +
    pixel-shuffle tail (dnn_superres ships the full EDSR; depth/width here
    are scaled down but the architecture matches)."""

    scale: int = 2
    features: int = 32
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x):
        h0 = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        h = h0
        for _ in range(self.n_blocks):
            r = nn.Conv(self.features, (3, 3), padding="SAME")(h)
            r = nn.relu(r)
            r = nn.Conv(self.features, (3, 3), padding="SAME")(r)
            h = h + 0.1 * r  # EDSR residual scaling
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h) + h0
        h = nn.Conv(self.scale * self.scale, (3, 3), padding="SAME")(h)
        N, H, W, C = h.shape
        sc = self.scale
        h = h.reshape(N, H, W, sc, sc).transpose(0, 1, 3, 2, 4).reshape(N, H * sc, W * sc, 1)
        return h


class LapSRN(nn.Module):
    """Lai et al. Laplacian-pyramid SR: progressive x2 stages, each
    predicting a residual added to an upsampled base (scale must be a
    power of two)."""

    scale: int = 2
    features: int = 16

    @nn.compact
    def __call__(self, x):
        out = x
        n_stages = int(np.log2(self.scale))
        for _ in range(n_stages):
            feat = nn.Conv(self.features, (3, 3), padding="SAME")(out)
            feat = nn.leaky_relu(feat, 0.2)
            feat = nn.Conv(self.features, (3, 3), padding="SAME")(feat)
            feat = nn.leaky_relu(feat, 0.2)
            # 4x4 stride-2 deconv as 4 phase filters + depth-to-space
            # (see FSRCNN note: ConvTranspose on the HR grid is
            # layout-bound on TPU)
            r4 = nn.Conv(4, (2, 2), padding="SAME")(feat)
            N, H, W, _ = out.shape
            res = (r4.reshape(N, H, W, 2, 2).transpose(0, 1, 3, 2, 4)
                   .reshape(N, H * 2, W * 2, 1))
            base = jax.image.resize(out, (N, H * 2, W * 2, 1), "bilinear")
            out = base + res
        return out


class DnnSuperRes:
    """DnnSuperResImpl-contract wrapper."""

    def __init__(self, algo: str = "espcn", scale: int = 2, seed: int = 0):
        self.algo = algo
        self.scale = scale
        if algo == "espcn":
            self.net = ESPCN(scale=scale)
        elif algo == "fsrcnn":
            self.net = FSRCNN(scale=scale)
        elif algo == "edsr":
            self.net = EDSR(scale=scale)
        elif algo == "lapsrn":
            self.net = LapSRN(scale=scale)
        else:
            raise ValueError(f"unknown algo {algo} (espcn|fsrcnn|edsr|lapsrn)")
        self.params = self.net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 1)))
        self._tx = None
        self._opt_state = None

    # ---- inference ----

    def upsample(self, img) -> jnp.ndarray:
        """(H, W) in [0, 1] -> (scale*H, scale*W)."""
        x = jnp.asarray(img, jnp.float32)[None, ..., None]
        out = self.net.apply(self.params, x)
        if self.algo != "lapsrn":  # LapSRN adds its pyramid bases internally
            base = jax.image.resize(x, (1, x.shape[1] * self.scale, x.shape[2] * self.scale, 1), "bilinear")
            out = out + base  # residual learning
        return jnp.clip(out[0, ..., 0], 0.0, 1.0)

    @staticmethod
    def upsample_bicubic(img, scale: int) -> jnp.ndarray:
        x = jnp.asarray(img, jnp.float32)
        return jax.image.resize(x, (x.shape[0] * scale, x.shape[1] * scale), "cubic")

    # ---- training ----

    def init_training(self, lr: float = 1e-3):
        self._tx = optax.adam(lr)
        self._opt_state = self._tx.init(self.params)

        add_base = self.algo != "lapsrn"  # must match upsample(): LapSRN
        # carries its own pyramid base internally

        @jax.jit
        def step(params, opt_state, lr_batch, hr_batch):
            def loss_fn(p):
                pred = self.net.apply(p, lr_batch)
                if add_base:
                    pred = pred + jax.image.resize(lr_batch, hr_batch.shape,
                                                   "bilinear")
                return jnp.mean((pred - hr_batch) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self._tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

    def train_step(self, lr_batch, hr_batch) -> float:
        """lr_batch (N, h, w, 1), hr_batch (N, h*scale, w*scale, 1)."""
        self.params, self._opt_state, loss = self._step(self.params, self._opt_state, lr_batch, hr_batch)
        return float(loss)

    # ---- persistence (readModel/setModel contract) ----

    def save_model(self, path: str):
        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        arrays = {"/".join(str(k) for k in kp): np.asarray(v) for kp, v in flat}
        arrays["__algo__"] = np.array(self.algo)
        arrays["__scale__"] = np.array(self.scale)
        np.savez(path, **arrays)

    def read_model(self, path: str):
        data = np.load(path, allow_pickle=False)
        flat, treedef = jax.tree_util.tree_flatten_with_path(self.params)
        new_leaves = []
        for kp, v in flat:
            key = "/".join(str(k) for k in kp)
            new_leaves.append(jnp.asarray(data[key]))
        self.params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.params), new_leaves
        )
        return self


def evaluate_psnr_ssim(model: "DnnSuperRes", hr_images) -> tuple[float, float]:
    """PSNR/SSIM of model.upsample against ground-truth HR images whose LR
    inputs are the reference benchmark's protocol (downsample by the model
    scale). The accuracy side of the reference's speed/accuracy table
    (dnn_superres/README.md:74-82)."""
    from opencv_contrib_tpu.quality import psnr, ssim

    ps, ss = [], []
    for hr in hr_images:
        hr = np.asarray(hr, np.float32)
        s = model.scale
        H = (hr.shape[0] // s) * s
        W = (hr.shape[1] // s) * s
        hr = hr[:H, :W]
        lr = np.asarray(jax.image.resize(
            jnp.asarray(hr), (H // s, W // s), "cubic"))
        out = np.asarray(model.upsample(lr))
        ps.append(float(psnr(out, hr)))
        ss.append(float(ssim(out, hr)))
    return float(np.mean(ps)), float(np.mean(ss))


def evaluate_bicubic(hr_images, scale: int) -> tuple[float, float]:
    """Bicubic baseline row of the same benchmark."""
    from opencv_contrib_tpu.quality import psnr, ssim

    ps, ss = [], []
    for hr in hr_images:
        hr = np.asarray(hr, np.float32)
        H = (hr.shape[0] // scale) * scale
        W = (hr.shape[1] // scale) * scale
        hr = hr[:H, :W]
        lr = jax.image.resize(jnp.asarray(hr), (H // scale, W // scale), "cubic")
        out = np.asarray(DnnSuperRes.upsample_bicubic(lr, scale))
        ps.append(float(psnr(out, hr)))
        ss.append(float(ssim(out, hr)))
    return float(np.mean(ps)), float(np.mean(ss))
