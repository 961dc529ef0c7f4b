"""ArUco marker detection demo — aruco/samples/detect_markers.cpp role.

Generates a dictionary, renders markers into a scene, detects + decodes
them back, and (optionally) estimates pose.

Usage:
    python samples/aruco_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.aruco import markers

    d = markers.generate_dictionary(n_markers=16, bits=4)
    scene = np.full((200, 260), 0.85, np.float32)
    placements = [(0, 20, 30), (7, 20, 150), (12, 110, 90)]
    for mid, y, x in placements:
        m = markers.draw_marker(d, mid, size_px=64)
        s_px = m.shape[0]
        scene[y:y + s_px, x:x + s_px] = m
    ids, corners = markers.detect_markers(jnp.asarray(scene), d)
    print(f"placed ids {sorted(m for m, _, _ in placements)}, "
          f"detected {sorted(int(i) for i in ids)}")


if __name__ == "__main__":
    main()
