"""Deformable Part Models detection (the dpm module).

Parity target: dpm/src/* (Felzenszwalb DPM cascade detector:
dpm_feature.cpp HOG pyramid, dpm_convolution.cpp filter responses,
dpm_model.cpp root+part filters with quadratic deformation costs,
distance transform part placement).

TPU-first: the feature pyramid is a static list of scales; filter
responses are lax conv_general_dilated on the MXU; the generalized
distance transform over quadratic deformation costs is a separable
max-plus convolution computed as a vectorized max over static shifts
(small displacement windows make the O(K) shifted-max cheaper than the
sequential lower-envelope algorithm on TPU).
"""

from opencv_contrib_tpu.dpm.detector import DPMModel, detect, gdt2d, score_scale

__all__ = ["DPMModel", "detect", "gdt2d", "score_scale"]
