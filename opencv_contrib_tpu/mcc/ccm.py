"""Color correction matrix fitting."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Standard 24-patch Macbeth ColorChecker sRGB values (in [0, 1], row-major)
MACBETH_SRGB = (
    np.array(
        [
            [115, 82, 68], [194, 150, 130], [98, 122, 157], [87, 108, 67],
            [133, 128, 177], [103, 189, 170], [214, 126, 44], [80, 91, 166],
            [193, 90, 99], [94, 60, 108], [157, 188, 64], [224, 163, 46],
            [56, 61, 150], [70, 148, 73], [175, 54, 60], [231, 199, 31],
            [187, 86, 149], [8, 133, 161], [243, 243, 242], [200, 200, 200],
            [160, 160, 160], [122, 122, 121], [85, 85, 85], [52, 52, 52],
        ],
        np.float32,
    )
    / 255.0
)


def _linearize(rgb, gamma: float = 2.2):
    return jnp.clip(rgb, 1e-6, 1.0) ** gamma


def _delinearize(lin, gamma: float = 2.2):
    return jnp.clip(lin, 0.0, None) ** (1.0 / gamma)


def fit_ccm(measured: jnp.ndarray, reference: jnp.ndarray, ccm_3x4: bool = False, gamma: float = 2.2):
    """Least-squares CCM in linear RGB: reference_lin ~= measured_lin @ M.
    measured/reference (N, 3) in [0,1] sRGB. Returns M (3,3) or (4,3)."""
    m = _linearize(jnp.asarray(measured, jnp.float32), gamma)
    r = _linearize(jnp.asarray(reference, jnp.float32), gamma)
    if ccm_3x4:
        m = jnp.concatenate([m, jnp.ones_like(m[:, :1])], axis=1)
    M, *_ = jnp.linalg.lstsq(m, r, rcond=None)
    return M


def apply_ccm(img: jnp.ndarray, M: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Apply a fitted CCM to an sRGB image (..., 3)."""
    lin = _linearize(img, gamma)
    if M.shape[0] == 4:
        lin = jnp.concatenate([lin, jnp.ones_like(lin[..., :1])], axis=-1)
    out = jnp.einsum("...i,ij->...j", lin, M)
    return jnp.clip(_delinearize(out, gamma), 0.0, 1.0)


def color_correction_model(measured_patches: jnp.ndarray, reference=None, gamma: float = 2.2):
    """ColorCorrectionModel contract: fit from the 24 measured chart patches
    (defaults to the Macbeth reference). Returns (M, apply_fn)."""
    if reference is None:
        reference = MACBETH_SRGB
    M = fit_ccm(measured_patches, reference, gamma=gamma)
    return M, lambda img: apply_ccm(img, M, gamma)
