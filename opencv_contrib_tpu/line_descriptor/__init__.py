"""Line detection + binary line descriptors (line_descriptor-module parity).

Reference anchors: LSDDetector / BinaryDescriptor (LBD over EDLine segments,
line_descriptor/include/opencv2/line_descriptor/descriptor.hpp:182,272) and
BinaryDescriptorMatcher (:290, multi-index hashing — mih.py implements the
Norouzi MIH index; features.match also offers dense Hamming matmul matching).

TPU-first: line segments from the Hough accumulator (peaks -> segments by
on-line support masking); the LBD-class descriptor aggregates oriented
gradient statistics in bands parallel to the line.
"""

from opencv_contrib_tpu.line_descriptor.lines import detect_line_segments, lbd_describe
from opencv_contrib_tpu.line_descriptor.mih import (
    lbd_binarize,
    mih_build,
    mih_knn_match,
    mih_radius_match,
    MIHIndex,
)

__all__ = ["detect_line_segments", "lbd_describe", "lbd_binarize",
           "mih_build", "mih_knn_match", "mih_radius_match", "MIHIndex"]
