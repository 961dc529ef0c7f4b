"""Line detection + binary line descriptors (line_descriptor-module parity).

Reference anchors: LSDDetector / BinaryDescriptor (LBD over EDLine segments,
line_descriptor/include/opencv2/line_descriptor/descriptor.hpp:182,272) and
BinaryDescriptorMatcher (:290, multi-index hashing — our features.match
Hamming matcher plays that role).

TPU-first: line segments from the Hough accumulator (peaks -> segments by
on-line support masking); the LBD-class descriptor aggregates oriented
gradient statistics in bands parallel to the line.
"""

from opencv_contrib_tpu.line_descriptor.lines import detect_line_segments, lbd_describe

__all__ = ["detect_line_segments", "lbd_describe"]
