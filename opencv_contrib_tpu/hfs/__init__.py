"""HFS: hierarchical feature selection image segmentation.

Parity target: hfs/src/* (HfsSegment: SLIC oversegmentation ->
Felzenszwalb-style graph merging on the superpixel graph in two stages with
learned boundary features -> final segment map; hfs/src/magnitude/ computes
gradient magnitude features, hfs/src/slic/ the superpixels).

TPU-first: superpixels + per-region features (mean color, boundary gradient
strength) are batched segment-sums on device; only the inherently
sequential union-find merge over sorted edges runs on host (as in the
reference, which does this stage on CPU even in its CUDA build).
"""

from opencv_contrib_tpu.hfs.segment import hfs_segment, region_adjacency, region_features

__all__ = ["hfs_segment", "region_adjacency", "region_features"]
