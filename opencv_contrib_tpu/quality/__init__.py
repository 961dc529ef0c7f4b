"""Image quality assessment (quality-module parity).

Reference anchors: quality/README.md:9-22 — QualityMSE, QualityPSNR,
QualitySSIM, QualityGMSD (full-reference; implemented in utils.metrics and
re-exported here with the module-level API), QualityBRISQUE (no-reference;
the NSS feature vector in `brisque` plus an IN-REPO-TRAINED regression
head in `brisque_svr` — train_brisque_model fits an RBF kernel-ridge SVR
stand-in on graded synthetic blur/noise/JPEG distortions, replacing the
binary SVM blob the reference ships; `no_reference_score` stays as the
untrained fallback heuristic).
"""

from opencv_contrib_tpu.utils.metrics import mse, psnr, ssim, gmsd
from opencv_contrib_tpu.quality.brisque import brisque_features, mscn_coefficients, no_reference_score
from opencv_contrib_tpu.quality.brisque_svr import (
    BrisqueModel, brisque_score, load_model, save_model, train_brisque_model)

__all__ = ["mse", "psnr", "ssim", "gmsd", "brisque_features",
           "mscn_coefficients", "no_reference_score", "BrisqueModel",
           "train_brisque_model", "brisque_score", "save_model", "load_model"]
