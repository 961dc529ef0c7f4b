"""Pixel-based parametric image registration (reg-module parity).

Reference anchors: reg/src — MapperGradShift, MapperGradEuclid,
MapperGradSimilar, MapperGradAffine, MapperGradProj (mappergrad*.cpp) and
the Map{Shift,Affine,Projec} result types; MapperPyramid for coarse-to-fine.

TPU-first: one Gauss-Newton driver over a model-specific warp
parameterization; Jacobians via autodiff of the warp; coarse-to-fine over
the pyramid; each level's iterations are a lax.scan.
"""

from opencv_contrib_tpu.reg.mapper import register_pyramid, warp_with_params, MODELS

__all__ = ["register_pyramid", "warp_with_params", "MODELS"]
