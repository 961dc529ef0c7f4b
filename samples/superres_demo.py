"""Super-resolution demo — the dnn_superres sample
(dnn_superres/samples/dnn_superres.cpp role).

Trains FSRCNN briefly on synthetic scenes, then upsamples an image (or a
held-out synthetic scene) x2 and reports PSNR vs bicubic.

Usage:
    python samples/superres_demo.py [image.png] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from opencv_contrib_tpu.models.dnn_superres import (
        DnnSuperRes, evaluate_bicubic, evaluate_psnr_ssim)
    from opencv_contrib_tpu.ximgproc.edge_forest import _synthetic_scene
    from opencv_contrib_tpu.utils import io

    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    rng = np.random.default_rng(0)
    train_hr = [np.clip(_synthetic_scene(rng, 96, 96)[0], 0, 1)
                for _ in range(48)]

    m = DnnSuperRes("fsrcnn", scale=2, seed=0)
    m.init_training(lr=2e-3)
    for s in range(steps):
        idx = rng.choice(len(train_hr), 8, replace=False)
        hr = np.stack([train_hr[i] for i in idx])[..., None]
        lr_b = np.stack([np.asarray(jax.image.resize(
            jnp.asarray(h[..., 0]), (48, 48), "cubic")) for h in hr])[..., None]
        loss = m.train_step(jnp.asarray(lr_b), jnp.asarray(hr))
        if s % 100 == 0:
            print(f"step {s}: loss {loss:.5f}")

    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        img = io.imread(sys.argv[1], gray=True)
        up = np.asarray(m.upsample(img))
        io.imwrite("sr_out.png", up)
        print(f"{img.shape} -> {up.shape} written to sr_out.png")
    else:
        test_hr = [np.clip(_synthetic_scene(np.random.default_rng(777 + i),
                                            96, 96)[0], 0, 1) for i in range(6)]
        p, s_ = evaluate_psnr_ssim(m, test_hr)
        pb, sb = evaluate_bicubic(test_hr, 2)
        print(f"FSRCNN {p:.2f} dB / {s_:.4f}  vs bicubic {pb:.2f} dB / {sb:.4f}")


if __name__ == "__main__":
    main()
