"""Custom calibration (ccalib-module parity).

Reference anchors: omnidirectional (Mei unified-sphere) camera model —
omnidir::projectPoints (ccalib/include/opencv2/ccalib/omnidir.hpp:103),
initUndistortRectifyMap (:141), undistortImage (:156), calibrate (:176);
MultiCameraCalibration's camera-pattern pose graph (multicalib.hpp:141) maps
onto rgbd.posegraph + mvg.resection and is exercised through those modules.
"""

from opencv_contrib_tpu.ccalib.omnidir import (
    project_points_omni,
    undistort_points_omni,
    undistort_image_omni,
    calibrate_xi,
)

from opencv_contrib_tpu.ccalib.random_pattern import find_correspondences, generate_pattern

__all__ = [
    "project_points_omni", "undistort_points_omni", "undistort_image_omni",
    "calibrate_xi", "find_correspondences", "generate_pattern",
]
