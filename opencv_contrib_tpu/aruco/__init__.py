"""ArUco-class fiducial markers (aruco-module parity).

Reference anchors: the aruco back-compat module (aruco/src/aruco.cpp —
detection now lives in main objdetect): dictionary-based square fiducials,
detectMarkers -> (corners, ids), drawMarker / generateImageMarker.

The reference ships fixed predefined dictionaries (data tables); we generate
dictionaries with the same recipe (random codes with a minimum pairwise
Hamming distance over all 4 rotations, seeded for reproducibility).

TPU-first split: thresholding, homography unwarp, bit sampling and
dictionary matching are device code; candidate quad extraction (connected
components + corner picking) is host-side scipy/numpy — the same
CPU-contour + GPU-refine split real pipelines use.
"""

from opencv_contrib_tpu.aruco.markers import (
    generate_dictionary,
    draw_marker,
    detect_markers,
)

__all__ = ["generate_dictionary", "draw_marker", "detect_markers"]
