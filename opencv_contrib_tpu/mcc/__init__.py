"""Color calibration (mcc-module parity).

Reference anchors: ColorCorrectionModel (mcc/include/opencv2/mcc/ccm.hpp:360
— CCM fitting with linearization) and CCheckerDetector (checker_detector.hpp
:129; detection of the physical chart is a round-2 item — the correction
model and the standard Macbeth reference colors are here).
"""

from opencv_contrib_tpu.mcc.ccm import (
    MACBETH_SRGB,
    fit_ccm,
    apply_ccm,
    color_correction_model,
)

__all__ = ["MACBETH_SRGB", "fit_ccm", "apply_ccm", "color_correction_model"]
