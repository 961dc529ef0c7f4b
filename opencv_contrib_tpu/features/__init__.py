"""Feature detection, description, matching — the xfeatures2d-class layer.

Capability parity targets (reference anchors in each module's docstring):
- detectors (detect, detect_x): Fast-Hessian/SURF-class scale-space blobs,
  Harris corners, FAST-class corners, Star/CenSurE center-surround, MSD
  self-dissimilarity, Harris-Laplace, TBMR-class affine regions + affine
  adaptation (elliptic keypoints).
- descriptors (describe, describe_x, learned): SURF-class oriented
  gradient grids (64-d), DAISY log-polar (200-d), binary families
  (BEBLID/BRIEF-class boxes, FREAK retinal, LATCH triplets), LUCID rank
  order, and VGG/BoostDesc-class learned projections TRAINED IN-REPO on
  synthetic warps (features.learned.train_projection).
- matchers (match): brute-force L2 + Hamming-as-matmul with ratio
  test/cross-check (cudafeatures2d::DescriptorMatcher-class), GMS motion
  statistics, LOGOS local geometric support.
- signatures (pct): PCT signatures + SQFD distance.

TPU-first: keypoints are fixed-capacity padded arrays with validity masks
(static shapes under jit); binary descriptors match on the MXU by unpacking
bits to ±1 and using hamming = (D - a.b)/2.
"""

from opencv_contrib_tpu.features.keypoints import Keypoints
from opencv_contrib_tpu.features import detect, detect_x, describe, describe_x, learned, match, pct

__all__ = ["Keypoints", "detect", "detect_x", "describe", "describe_x",
           "learned", "match", "pct"]
