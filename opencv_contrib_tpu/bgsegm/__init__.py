"""Background subtraction (bgsegm-module parity).

Reference anchors: bgsegm/include/opencv2/bgsegm.hpp —
BackgroundSubtractorMOG (:62, gaussian mixtures), CNT (:250, pixel
stability counters), GSOC/LSBP (sample consensus); plus a synthetic
sequence generator (SyntheticSequenceGenerator) used by its tests.

TPU-first: per-pixel model state lives in stacked arrays; one jitted
`apply` step updates every pixel's mixture in parallel.
"""

from opencv_contrib_tpu.bgsegm.mog import MogState, mog_create, mog_apply
from opencv_contrib_tpu.bgsegm.cnt import CntState, cnt_create, cnt_apply
from opencv_contrib_tpu.bgsegm.gmg import GmgState, gmg_apply, gmg_create
from opencv_contrib_tpu.bgsegm.gsoc import (
    GsocState, LsbpState, gsoc_apply, gsoc_create, lsbp_apply, lsbp_create, lsbp_descriptor,
)
from opencv_contrib_tpu.bgsegm.synthetic import synthetic_sequence

__all__ = [
    "MogState", "mog_create", "mog_apply",
    "CntState", "cnt_create", "cnt_apply",
    "GmgState", "gmg_create", "gmg_apply",
    "GsocState", "gsoc_create", "gsoc_apply",
    "LsbpState", "lsbp_create", "lsbp_apply", "lsbp_descriptor",
    "synthetic_sequence",
]
