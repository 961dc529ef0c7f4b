"""Stereo matching (stereo + cudastereo module parity).

Reference anchors: StereoBinaryBM / StereoBinarySGBM
(stereo/src/stereo_binary_{bm,sgm}.cpp), census transform descriptors
(stereo/src/descriptor.cpp), QuasiDenseStereo
(stereo/src/quasi_dense_stereo.cpp), CUDA StereoBM/SGM (cudastereo).

TPU-first: the cost volume is a (D, H, W) stack built by shifted fused
elementwise ops; aggregation is box filtering; SGM's directional DP is a
lax.scan along each scan direction (log-depth over disparities is not
needed — D is the vector lane dim).
"""

from opencv_contrib_tpu.stereo.quasi_dense import quasi_dense_stereo, zncc_volume
from opencv_contrib_tpu.stereo.matching import (
    census_transform,
    cost_volume_sad,
    cost_volume_census,
    block_match,
    sgm_aggregate,
    sgm_match,
    lr_consistency,
)

__all__ = [
    "census_transform",
    "cost_volume_sad",
    "cost_volume_census",
    "block_match",
    "sgm_aggregate",
    "sgm_match",
    "lr_consistency",
]
