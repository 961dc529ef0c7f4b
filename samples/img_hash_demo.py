"""Perceptual hashing demo — img_hash/samples/hash_samples.cpp role.

Computes all hash families on an image and its perturbations, showing
Hamming distances (small for benign edits, large for different content).

Usage:
    python samples/img_hash_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu import img_hash

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (96, 128)).astype(np.float32)
    for _ in range(3):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3.0
    variants = {
        "identical": base,
        "+noise": np.clip(base + rng.normal(0, 0.02, base.shape), 0, 1).astype(np.float32),
        "brighter": np.clip(base * 1.15, 0, 1),
        "different": rng.uniform(0, 1, base.shape).astype(np.float32),
    }
    for name, fn in (("average", img_hash.average_hash),
                     ("block-mean", img_hash.block_mean_hash),
                     ("phash", img_hash.phash)):
        h0 = np.asarray(fn(jnp.asarray(base)))
        row = []
        for vn, img in variants.items():
            h = np.asarray(fn(jnp.asarray(img)))
            row.append(f"{vn}:{int((h != h0).sum()):3d}")
        print(f"{name:>10}: " + "  ".join(row))


if __name__ == "__main__":
    main()
