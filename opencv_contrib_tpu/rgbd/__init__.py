"""Dense RGB-D SLAM: frame pipeline, fast ICP, TSDF fusion, KinectFusion,
RGB-D odometry, pose-graph optimization, submaps.

Parity: the reference's rgbd module (SURVEY §2.1) — KinFu facade
(rgbd/src/kinfu.cpp), fast_icp, tsdf/hash_tsdf, odometry.cpp, pose_graph.cpp,
submap.hpp/large_kinfu.cpp — rebuilt TPU-first: the volume is a dense jnp
array updated by gather-formulated integration (no scatter), raycast is a
vectorized fixed-step march, ICP's getAb is one fused einsum reduction, and
the host keeps only the per-frame control loop (the reference's own
Mat/UMat split, kinfu.cpp:197-229).
"""

from opencv_contrib_tpu.rgbd import (
    colored_tsdf,
    dynafu,
    depth_utils,
    frame,
    hash_tsdf,
    icp,
    kinfu,
    linemod,
    normals,
    odometry,
    posegraph,
    submap,
    tsdf,
    warpfield,
)

__all__ = [
    "colored_tsdf", "depth_utils", "dynafu", "frame", "hash_tsdf", "icp", "kinfu",
    "linemod", "normals", "odometry", "posegraph", "submap", "tsdf", "warpfield",
]
