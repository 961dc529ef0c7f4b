"""Computational photography demo — xphoto samples role
(bm3d_image_denoising + inpainting + color_balance samples).

Runs white balance, two-step BM3D denoising, and diffusion inpainting on
synthetic fixtures, reporting the quantitative effect of each.

Usage:
    python samples/xphoto_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu import xphoto

    rng = np.random.default_rng(0)

    # white balance on a color-cast image
    img = rng.uniform(0.2, 0.8, (64, 64, 3)).astype(np.float32)
    cast = img * np.array([1.3, 1.0, 0.7], np.float32)
    wb = np.asarray(xphoto.grayworld_wb(jnp.asarray(np.clip(cast, 0, 1))))
    print(f"grayworld WB: channel means {cast.reshape(-1,3).mean(0).round(3)}"
          f" -> {wb.reshape(-1,3).mean(0).round(3)}")

    # BM3D two-step denoise
    x = np.zeros((96, 96), np.float32)
    x[20:70, 15:60] = 0.7
    x[40:90, 50:90] = np.linspace(0.2, 0.9, 40)[None, :]
    sigma = 0.12
    noisy = np.clip(x + rng.normal(0, sigma, x.shape), 0, 1).astype(np.float32)

    def psnr(a):
        return -10 * np.log10(np.mean((np.asarray(a) - x) ** 2))

    d1 = xphoto.bm3d_denoise(jnp.asarray(noisy), sigma=sigma)
    d2 = xphoto.bm3d(jnp.asarray(noisy), sigma=sigma)
    print(f"BM3D: noisy {psnr(noisy):.2f} dB -> step1 {psnr(d1):.2f} dB -> "
          f"step1+2 {psnr(d2):.2f} dB")

    # diffusion inpainting
    img2 = np.asarray(jnp.asarray(x))
    mask = np.zeros_like(img2, bool)
    mask[40:56, 30:46] = True
    corrupted = img2.copy()
    corrupted[mask] = 0.0
    filled = np.asarray(xphoto.inpaint_diffusion(jnp.asarray(corrupted),
                                                 jnp.asarray(mask)))
    err = np.abs(filled - img2)[mask].mean()
    print(f"inpaint: mean reconstruction error in hole {err:.4f}")


if __name__ == "__main__":
    main()
