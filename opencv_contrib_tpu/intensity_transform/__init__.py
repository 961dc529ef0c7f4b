"""Intensity transforms (intensity_transform-module parity).

Reference anchors: intensity_transform/src/intensity_transform.cpp —
gammaCorrection, logTransform, autoscaling, contrastStretching; BIMEF
(bimef.cpp) provided as a simplified multi-exposure fusion.
"""

from opencv_contrib_tpu.intensity_transform.transforms import (
    gamma_correction,
    log_transform,
    autoscaling,
    contrast_stretching,
    bimef,
)

__all__ = ["gamma_correction", "log_transform", "autoscaling", "contrast_stretching", "bimef"]
