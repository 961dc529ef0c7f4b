"""Boosted sliding-window object detection (xobjdetect + cudaobjdetect roles).

Parity targets (reference anchors):
- xobjdetect: WBDetector (xobjdetect/src/wbdetector.cpp) — WaldBoost over
  integral channel features (ICF) with early rejection.
- cudaobjdetect: cuda::HOG (cudaobjdetect/src/hog.cpp + cuda/hog.cu) —
  HOG descriptor + linear SVM over a multi-scale sliding-window grid.

TPU-first: channels are computed once per image; ALL windows at a scale are
scored as one batched gather + matmul (the MXU replaces the reference's
per-window CUDA blocks); WaldBoost's sequential rejection becomes a masked
cumulative sum over stump responses evaluated for every window at once —
on TPU, evaluating all stumps everywhere is cheaper than branching.
"""

from opencv_contrib_tpu.xobjdetect import hog, waldboost

__all__ = ["hog", "waldboost"]
