"""Single-object trackers + filters (the tracking module's core families).

Parity targets (reference anchors):
- MOSSE correlation filter (tracking/src/mosseTracker.cpp)
- KCF kernelized correlation filter with HOG-lite channels
  (tracking/src/trackerKCF.cpp:74 — fft2/ifft2 :88-90, denseGaussKernel :99)
- CSRT-class channel weighting lives on the same correlation substrate
  (trackerCSRT.cpp) — round-1 scope: MOSSE + KCF.
- Unscented Kalman filter (tracking/src/unscented_kalman.cpp,
  kalman_filters.hpp) + linear KF.

TPU-first: correlation trackers are FFT-domain elementwise math (one fused
program per update); the UKF sigma-point propagation is a vmap.
"""

from opencv_contrib_tpu.tracking import correlation, kalman

__all__ = ["correlation", "kalman"]
