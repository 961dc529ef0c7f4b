"""Incremental structure-from-motion.

Parity: the reference's sfm module — libmv's simple pipeline
(sfm/src/libmv/simple_pipeline/pipeline.cc:138-264 resect/intersect/bundle
fixpoint, initialize_reconstruction.cc two-frame init, keyframe_selection.cc
GRIC) and the one-call cv::sfm::reconstruct facade (reconstruct.cpp:236).

TPU-first: tracks live in a dense (views x tracks) observation tensor; every
solver stage (RANSAC init, PnP resection, triangulation, bundle adjustment)
is a jitted static-shape program; only the fixpoint control flow runs on the
host, exactly the "host control loop + device bulk kernels" split the
reference's KinFu uses (SURVEY §3.2).
"""

from opencv_contrib_tpu.sfm import pairing, pipeline, tracks

__all__ = ["pairing", "pipeline", "tracks"]
