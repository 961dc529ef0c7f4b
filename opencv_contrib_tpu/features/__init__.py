"""Feature detection, description, matching — the xfeatures2d-class layer.

Capability parity targets (reference anchors in each module's docstring):
- detectors: Fast-Hessian/SURF-class scale-space blobs, Harris corners,
  FAST-class corners, Star/CenSurE-class center-surround.
- descriptors: SURF-class oriented gradient grids (64-d), DAISY log-polar
  (200-d), binary box-difference families (BEBLID/BRIEF/ORB-class).
- matchers: brute-force L2 + Hamming-as-matmul with ratio test/cross-check
  (cudafeatures2d::DescriptorMatcher-class), GMS motion statistics.

TPU-first: keypoints are fixed-capacity padded arrays with validity masks
(static shapes under jit); binary descriptors match on the MXU by unpacking
bits to ±1 and using hamming = (D - a.b)/2.
"""

from opencv_contrib_tpu.features.keypoints import Keypoints
from opencv_contrib_tpu.features import detect, describe, match

__all__ = ["Keypoints", "detect", "describe", "match"]
