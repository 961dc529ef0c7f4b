"""opencv_contrib_tpu — a TPU-native SLAM/SfM engine with the capability
surface of opencv/opencv_contrib's geometry stack.

Built from scratch in JAX/XLA/Pallas. Not a port: the reference
(opencv/opencv_contrib) defines *what* to build; the architecture here is
idiomatic TPU — static-shape padded arrays with validity masks, vmapped
geometry, Pallas kernels for the hot ops, and pjit/shard_map sharding over a
device mesh for the distributed paths.

Module federation (mirrors the reference's module DAG, SURVEY.md §2):

- ``core``      — SE(3)/SO(3), camera models (pinhole + distortion, omnidir),
                  color conversion, image pyramids.
- ``ops``       — image processing primitives (integral image, filters,
                  warps, resize, histograms) + Pallas kernels.
- ``features``  — detectors (Fast-Hessian/SURF-class, FAST, Star/CenSurE,
                  Harris-Laplace), descriptors (SURF, DAISY, BEBLID/BRIEF/
                  FREAK/LATCH-class binary), brute-force matchers
                  (matmul + top-k, ratio test, GMS).
- ``mvg``       — multiview geometry: 8/7-point fundamental, essential
                  decomposition, DLT/PnP resection, n-view triangulation,
                  homography, vmapped RANSAC.
- ``ba``        — bundle adjustment: vmapped reprojection residuals,
                  Levenberg-Marquardt with Schur-complement elimination of
                  landmarks and PCG on the reduced camera system.
- ``sfm``       — incremental reconstruction driver: dense tracks tensor,
                  two-view init, resect/intersect/bundle fixpoint.
- ``rgbd``      — dense RGB-D SLAM: depth frame pipeline, fast point-to-plane
                  ICP, TSDF fusion + raycast, KinectFusion loop, RGB-D
                  odometry, pose-graph optimization, submaps.
- ``flow``      — dense optical flow (DIS-class inverse search + variational
                  refinement, Farneback-class, TV-L1-class).
- ``parallel``  — mesh/sharding helpers, distributed matching sweeps and
                  Schur BA over jax.lax collectives.
- ``utils``     — datasets (TUM/KITTI/Sintel readers), io, config, metrics
                  (ATE/RPE, PSNR/SSIM), checkpointing.
- ``models``    — learned models (super-resolution EDSR/ESPCN-class, etc.).
"""

__version__ = "0.1.0"

from opencv_contrib_tpu import (
    core, ops, features, mvg, ba, sfm, rgbd, flow, parallel, utils,
    tracking, bgsegm, stereo, xphoto, img_hash, saliency,
    intensity_transform, phase_unwrapping, reg,
    quality, shape, structured_light, superres, videostab, fuzzy, ximgproc,
    face, surface_matching, ccalib, mcc, plot, line_descriptor,
    bioinspired, models, signal, alphamat, aruco,
    text, xobjdetect, dpm, hfs, rapid, wechat_qrcode,
)

__all__ = [
    "core",
    "ops",
    "features",
    "mvg",
    "ba",
    "sfm",
    "rgbd",
    "flow",
    "parallel",
    "utils",
    "tracking",
    "bgsegm",
    "stereo",
    "xphoto",
    "img_hash",
    "saliency",
    "intensity_transform",
    "phase_unwrapping",
    "reg",
    "quality",
    "shape",
    "structured_light",
    "superres",
    "videostab",
    "fuzzy",
    "ximgproc",
    "face",
    "surface_matching",
    "ccalib",
    "mcc",
    "plot",
    "line_descriptor",
    "bioinspired",
    "models",
    "signal",
    "alphamat",
    "aruco",
    "text",
    "xobjdetect",
    "dpm",
    "hfs",
    "rapid",
    "wechat_qrcode",
    "__version__",
]
