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

from opencv_contrib_tpu.mcc.detector import detect_and_fit_ccm, detect_chart, find_chart_cells

__all__ = [
    "MACBETH_SRGB", "fit_ccm", "apply_ccm", "color_correction_model",
    "detect_and_fit_ccm", "detect_chart", "find_chart_cells",
]
