"""Saliency detection (saliency-module parity).

Reference anchors: saliency/src — StaticSaliencySpectralResidual
(staticSaliencySpectralResidual.cpp), StaticSaliencyFineGrained
(staticSaliencyFineGrained.cpp), MotionSaliencyBinWangApr2014 (simplified
here to a temporal-model motion saliency), ObjectnessBING (round-2 scope:
gradient-norm objectness proxy provided).
"""

from opencv_contrib_tpu.saliency.bing import objectness_boxes, score_windows, train_template
from opencv_contrib_tpu.saliency.static import spectral_residual, fine_grained
from opencv_contrib_tpu.saliency.motion import MotionSaliency, motion_create, motion_apply

__all__ = [
    "spectral_residual", "fine_grained", "MotionSaliency", "motion_create",
    "motion_apply", "objectness_boxes", "score_windows", "train_template",
]
