"""Dense + sparse optical flow.

Parity targets (reference anchors):
- DIS-class dense flow: patch-based inverse search + densification +
  variational refinement (the engine structure of DeepFlow/RLOF's pipeline:
  optflow/src/deepflow.cpp:50-159 delegates per-level solves to
  cv::VariationalRefinement; rlofflow.cpp:258 runs the same post-pass; DIS
  itself lives in main opencv video).
- Pyramidal Lucas-Kanade (sparse + dense) — cudaoptflow's PyrLK family.
- TV-L1 primal-dual — optflow/src/tvl1flow.cpp (deprecated copy) and
  cudaoptflow tvl1flow.cu.
- Motion templates (MHI) — optflow/src/motempl.cpp.

TPU-first: every solver is a fixed-iteration lax.scan; patches are batched
gathers; densification is a box-filtered weighted average; the variational
solver is a red-black/Jacobi sweep expressed with rolls.
"""

from opencv_contrib_tpu.flow import dis, extra, gpc, lk, motempl, pcaflow, tvl1

__all__ = ["dis", "extra", "lk", "tvl1", "motempl"]
