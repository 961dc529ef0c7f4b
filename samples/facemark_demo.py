"""Facial landmark demo — face/samples/facemark_demo_aam.cpp /
facemark_demo_lbf.cpp role.

Trains the cascaded-regression facemark AND the AAM on synthetic faces,
fits both on a held-out face from a box, prints landmark errors.

Usage:
    python samples/facemark_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def make_face(cy, cx, s, H=96, W=96):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = np.zeros((H, W), np.float32)
    img[(((yy - cy) / (1.3 * s)) ** 2 + ((xx - cx) / s) ** 2) < 1] = 0.8
    ey, ex = cy - 0.4 * s, 0.45 * s
    for sx in (-1, 1):
        img[(((yy - ey) ** 2 + (xx - (cx + sx * ex)) ** 2) < (0.18 * s) ** 2)] = 0.2
    img[(np.abs(yy - (cy + 0.55 * s)) < 0.08 * s) & (np.abs(xx - cx) < 0.35 * s)] = 0.3
    img[(np.abs(yy - (cy + 0.1 * s)) < 0.12 * s) & (np.abs(xx - cx) < 0.07 * s)] = 0.5
    lm = np.array([[ey, cx - ex], [ey, cx + ex], [cy + 0.1 * s, cx],
                   [cy + 0.55 * s, cx - 0.35 * s], [cy + 0.55 * s, cx + 0.35 * s],
                   [cy + 1.25 * s, cx]], np.float32)
    return img, lm


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.face import aam

    rng = np.random.default_rng(0)
    imgs, shapes = [], []
    for _ in range(12):
        img, lm = make_face(44 + rng.uniform(-6, 6), 46 + rng.uniform(-6, 6),
                            22 + rng.uniform(-4, 5))
        imgs.append(img + rng.normal(0, 0.01, img.shape).astype(np.float32))
        shapes.append(lm)
    print("training AAM on 12 synthetic faces ...")
    model = aam.train(imgs, shapes, n_shape_modes=4, n_tex_modes=4)

    img_t, lm_t = make_face(49, 43, 25)
    lo, hi = lm_t.min(0), lm_t.max(0)
    box = (lo[0] - 0.05 * (hi[0] - lo[0]), lo[1] - 0.05 * (hi[1] - lo[1]),
           1.1 * (hi[0] - lo[0]), 1.1 * (hi[1] - lo[1]))
    q0 = aam.init_params(model, box)
    shape0 = np.asarray(aam._shape_from_params(model, q0))
    shape_fit, _ = aam.fit(model, jnp.asarray(img_t), q0)
    e0 = np.linalg.norm(shape0 - lm_t, axis=1).mean()
    e1 = np.linalg.norm(np.asarray(shape_fit) - lm_t, axis=1).mean()
    print(f"AAM: box-init error {e0:.2f} px -> fitted {e1:.2f} px")
    for name, (y, x) in zip(
            ["eyeL", "eyeR", "nose", "mouthL", "mouthR", "chin"],
            np.asarray(shape_fit)):
        print(f"  {name}: ({y:.1f}, {x:.1f})")


if __name__ == "__main__":
    main()
