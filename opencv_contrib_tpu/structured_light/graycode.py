"""Gray-code structured light: pattern generation + decoding."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def generate_graycode_patterns(proj_w: int, proj_h: int):
    """All column+row gray-code bit patterns (+inverses), plus white/black.

    Returns (patterns (P, H, W) float 0/1, n_col_bits, n_row_bits) in the
    order [col bits, col bits inverted, row bits, row bits inverted, white,
    black] (GrayCodePattern::generate contract)."""
    ncb = int(np.ceil(np.log2(max(proj_w, 1))))
    nrb = int(np.ceil(np.log2(max(proj_h, 1))))
    x = jnp.arange(proj_w)
    y = jnp.arange(proj_h)
    gx = x ^ (x >> 1)
    gy = y ^ (y >> 1)
    pats = []
    for b in range(ncb - 1, -1, -1):
        bit = ((gx >> b) & 1).astype(jnp.float32)
        pats.append(jnp.broadcast_to(bit[None, :], (proj_h, proj_w)))
    for b in range(ncb - 1, -1, -1):
        bit = 1.0 - ((gx >> b) & 1).astype(jnp.float32)
        pats.append(jnp.broadcast_to(bit[None, :], (proj_h, proj_w)))
    for b in range(nrb - 1, -1, -1):
        bit = ((gy >> b) & 1).astype(jnp.float32)
        pats.append(jnp.broadcast_to(bit[:, None], (proj_h, proj_w)))
    for b in range(nrb - 1, -1, -1):
        bit = 1.0 - ((gy >> b) & 1).astype(jnp.float32)
        pats.append(jnp.broadcast_to(bit[:, None], (proj_h, proj_w)))
    pats.append(jnp.ones((proj_h, proj_w)))
    pats.append(jnp.zeros((proj_h, proj_w)))
    return jnp.stack(pats), ncb, nrb


def decode_graycode(captured: jnp.ndarray, n_col_bits: int, n_row_bits: int, thresh: float = 0.1):
    """Decode captured pattern stack (same order as generate) into projector
    (col, row) coordinates per camera pixel + validity mask.

    captured (P, H, W) float images.
    """
    ncb, nrb = n_col_bits, n_row_bits
    col_pos = captured[:ncb]
    col_inv = captured[ncb : 2 * ncb]
    row_pos = captured[2 * ncb : 2 * ncb + nrb]
    row_inv = captured[2 * ncb + nrb : 2 * ncb + 2 * nrb]
    white = captured[-2]
    black = captured[-1]

    valid = (white - black) > thresh
    col_bits = col_pos > col_inv  # (ncb, H, W)
    row_bits = row_pos > row_inv

    def gray_to_binary(bits):
        # bits: MSB first
        def body(carry, b):
            carry = jnp.logical_xor(carry, b)
            return carry, carry

        _, out = jax.lax.scan(body, jnp.zeros_like(bits[0]), bits)
        return out

    col_bin = gray_to_binary(col_bits)
    row_bin = gray_to_binary(row_bits)
    weights_c = 2 ** jnp.arange(ncb - 1, -1, -1)
    weights_r = 2 ** jnp.arange(nrb - 1, -1, -1)
    col = jnp.einsum("b,bhw->hw", weights_c, col_bin.astype(jnp.int32))
    row = jnp.einsum("b,bhw->hw", weights_r, row_bin.astype(jnp.int32))
    return col, row, valid
