"""Video stabilization (videostab-module parity).

Reference anchor: the StabilizerBase pipeline (videostab/include/opencv2/
videostab/stabilizer.hpp:66 — motion estimation -> trajectory smoothing ->
wobble-free warping; MotionEstimatorRansacL2, GaussianMotionFilter).

TPU-first: per-frame-pair global motion via reg.register_pyramid
(similarity model), trajectory accumulation + Gaussian smoothing on the
parameter sequence, inverse-compensation warps.
"""

from opencv_contrib_tpu.videostab.stabilizer import estimate_motions, smooth_trajectory, stabilize
from opencv_contrib_tpu.videostab.extra import (
    ransac_motion,
    lp_stabilize_trajectory,
    calc_blurriness,
    weighting_deblur,
    color_average_inpaint,
    consistent_mosaic_inpaint,
    wobble_suppress,
)

__all__ = ["estimate_motions", "smooth_trajectory", "stabilize",
           "ransac_motion", "lp_stabilize_trajectory", "calc_blurriness",
           "weighting_deblur", "color_average_inpaint",
           "consistent_mosaic_inpaint", "wobble_suppress"]
