"""Image quality assessment (quality-module parity).

Reference anchors: quality/README.md:9-22 — QualityMSE, QualityPSNR,
QualitySSIM, QualityGMSD (full-reference; implemented in utils.metrics and
re-exported here with the module-level API), QualityBRISQUE (no-reference;
here the BRISQUE natural-scene-statistics feature vector + a
variance-of-MSCN sharpness score stand-in for the SVM stage — the learned
SVM weights are data the reference ships, not code).
"""

from opencv_contrib_tpu.utils.metrics import mse, psnr, ssim, gmsd
from opencv_contrib_tpu.quality.brisque import brisque_features, mscn_coefficients, no_reference_score

__all__ = ["mse", "psnr", "ssim", "gmsd", "brisque_features", "mscn_coefficients", "no_reference_score"]
