"""Single- and multi-object trackers (the tracking module's families).

Parity targets (reference anchors):
- MOSSE correlation filter (tracking/src/mosseTracker.cpp)
- KCF kernelized correlation filter (tracking/src/trackerKCF.cpp:74)
- CSRT channel/spatial reliability DCF (tracking/src/trackerCSRT.cpp:28)
- MedianFlow forward-backward LK voting (trackerMedianFlow.cpp)
- MIL online multiple-instance boosting (trackerMIL.cpp, feature.cpp)
- TLD tracking-learning-detection cascade (tld*.cpp)
- TrackerByMatching multi-target pipeline + Kuhn-Munkres assignment
  (tracking_by_matching.cpp, kuhn_munkres.cpp)
- Unscented/linear Kalman filters (kalman_filters.hpp)

TPU-first: correlation trackers are FFT-domain elementwise math (one fused
program per update); MIL/TLD evaluate every candidate window as batched
tensor ops; only the inherently sequential Hungarian augmentation runs on
host (as it does in the reference).
"""

from opencv_contrib_tpu.tracking import (
    boosting,
    correlation,
    csrt,
    kalman,
    matching,
    medianflow,
    mil,
    multitracker,
    siam,
    tld,
    twist,
)

__all__ = ["boosting", "correlation", "csrt", "kalman", "matching", "medianflow",
           "mil", "multitracker", "siam", "tld", "twist"]
