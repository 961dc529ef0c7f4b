"""3D surface matching (surface_matching-module parity).

Reference anchors: PPF3DDetector::{trainModel, match}
(surface_matching/include/opencv2/surface_matching/ppf_match_3d.hpp:97,131,
141 — 4D point-pair-feature hashing + pose voting, Pose3D clustering) and
the standalone ICP (icp.hpp:80 registerModelToScene — point-to-plane,
pyramid, sample picking; independent of the KinFu ICP).

TPU-first: PPFs for all sampled pairs are one batched computation;
the reference's hash table becomes quantized-feature keys with
sort/searchsorted joins (the same static-shape trick as hash_tsdf);
voting is a scatter-add over (reference point, angle) bins.
"""

from opencv_contrib_tpu.surface_matching.ppf import (
    compute_ppf_features,
    PPFModel,
    train_model,
    match as ppf_match,
)
from opencv_contrib_tpu.surface_matching.icp3d import register_model_to_scene

__all__ = ["compute_ppf_features", "PPFModel", "train_model", "ppf_match", "register_model_to_scene"]
