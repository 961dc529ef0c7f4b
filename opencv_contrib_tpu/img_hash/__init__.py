"""Perceptual image hashing (img_hash-module parity).

Reference anchors: img_hash/src — average_hash.cpp, block_mean_hash.cpp,
phash.cpp, color_moment_hash.cpp, radial_variance_hash.cpp,
marr_hildreth_hash.cpp; all `: public ImgHashBase` with compute/compare.

Hashes return bit arrays (uint8-packed rows) or float vectors; `compare`
follows each reference class's metric (Hamming for binary, L2 for
color-moment).
"""

from opencv_contrib_tpu.img_hash.hashes import (
    average_hash,
    block_mean_hash,
    phash,
    color_moment_hash,
    radial_variance_hash,
    marr_hildreth_hash,
    hamming_compare,
)

__all__ = [
    "average_hash",
    "block_mean_hash",
    "phash",
    "color_moment_hash",
    "radial_variance_hash",
    "marr_hildreth_hash",
    "hamming_compare",
]
