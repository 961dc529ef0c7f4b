"""DCT-domain denoising (parity: xphoto dctDenoising,
xphoto/src/dct_image_denoising.cpp): hard-threshold 2D DCT coefficients of
overlapping tiles and average. TPU-first: all tiles as one batch; DCT-II via
FFT-free matrix multiply (16x16 basis on the MXU)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _dct_matrix(n: int) -> jnp.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    M = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    M[0] /= np.sqrt(2.0)
    return jnp.asarray(M, jnp.float32)


@partial(jax.jit, static_argnames=("tile",))
def dct_denoise(img: jnp.ndarray, sigma: float = 0.05, tile: int = 16) -> jnp.ndarray:
    """Grayscale (H, W) denoising; threshold = 3 sigma."""
    H, W = img.shape
    Hc = (H // tile) * tile
    Wc = (W // tile) * tile
    M = _dct_matrix(tile)

    def denoise_tiles(x):
        t = x.reshape(Hc // tile, tile, Wc // tile, tile).transpose(0, 2, 1, 3)
        coef = jnp.einsum("ab,ntbc,cd->ntad", M, t, M.T)
        keep = jnp.abs(coef) > 3.0 * sigma
        keep = keep.at[..., 0, 0].set(True)  # always keep DC
        coef = coef * keep
        back = jnp.einsum("ba,ntbc,cd->ntad", M, coef, M)
        return back.transpose(0, 2, 1, 3).reshape(Hc, Wc)

    out = denoise_tiles(img[:Hc, :Wc])
    # second pass with half-tile shift, averaged (reduces blocking)
    s = tile // 2
    Hs = ((H - s) // tile) * tile
    Ws = ((W - s) // tile) * tile
    if Hs > 0 and Ws > 0:
        M2 = M

        def denoise_shift(x):
            t = x.reshape(Hs // tile, tile, Ws // tile, tile).transpose(0, 2, 1, 3)
            coef = jnp.einsum("ab,ntbc,cd->ntad", M2, t, M2.T)
            keep = jnp.abs(coef) > 3.0 * sigma
            keep = keep.at[..., 0, 0].set(True)
            coef = coef * keep
            back = jnp.einsum("ba,ntbc,cd->ntad", M2, coef, M2)
            return back.transpose(0, 2, 1, 3).reshape(Hs, Ws)

        out2 = denoise_shift(img[s : s + Hs, s : s + Ws])
        merged = out.at[s : s + Hs, s : s + Ws].set(
            0.5 * (out[s : s + Hs, s : s + Ws] + out2)
        )
        out = merged
    return jnp.concatenate(
        [jnp.concatenate([out, img[:Hc, Wc:]], axis=1), img[Hc:]], axis=0
    ) if (Hc < H or Wc < W) else out
