"""Structured edge detection demo — ximgproc/samples/structured_edge_detection.cpp role.

Trains the in-repo edge model (or loads nothing — training is seconds) and
writes edge maps for an input image, comparing the learned detector with
the gradient baseline.

Usage:
    python samples/edge_detection_demo.py [image.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.ximgproc import edge_forest as ef
    from opencv_contrib_tpu.ximgproc.edges import structured_edges_lite
    from opencv_contrib_tpu.utils import io

    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        img = io.imread(sys.argv[1], gray=True)
    else:
        img, _ = ef._synthetic_scene(np.random.default_rng(3))
    print("training edge model on synthetic supervision ...")
    params = ef.train(n_images=24, steps=250)
    e_learned = np.asarray(ef.edges_nms(ef.structured_edges(jnp.asarray(img), params), jnp.asarray(img)))
    e_grad = np.asarray(structured_edges_lite(jnp.asarray(img)))
    io.imwrite("edges_learned.png", e_learned)
    io.imwrite("edges_gradient.png", e_grad)
    print(f"edge maps written: edges_learned.png ({e_learned.mean():.4f} mean), "
          f"edges_gradient.png ({e_grad.mean():.4f} mean)")


if __name__ == "__main__":
    main()
