"""Video stabilization (videostab-module parity).

Reference anchor: the StabilizerBase pipeline (videostab/include/opencv2/
videostab/stabilizer.hpp:66 — motion estimation -> trajectory smoothing ->
wobble-free warping; MotionEstimatorRansacL2, GaussianMotionFilter).

TPU-first: per-frame-pair global motion via reg.register_pyramid
(similarity model), trajectory accumulation + Gaussian smoothing on the
parameter sequence, inverse-compensation warps.
"""

from opencv_contrib_tpu.videostab.stabilizer import estimate_motions, smooth_trajectory, stabilize

__all__ = ["estimate_motions", "smooth_trajectory", "stabilize"]
