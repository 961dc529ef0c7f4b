"""Learned models (dnn_superres / dnn-module-class capability).

Reference anchors: DnnSuperResImpl::{readModel, setModel, upsample}
(dnn_superres/src/dnn_superres.cpp) supporting EDSR/ESPCN/FSRCNN/LapSRN.
The reference ships pre-trained weights as data; here the architectures are
implemented in flax with the same set-model/upsample API, weight
save/load, a training step for fitting, and bicubic fallback.
"""

from opencv_contrib_tpu.models.dnn_superres import DnnSuperRes, ESPCN, FSRCNN

__all__ = ["DnnSuperRes", "ESPCN", "FSRCNN"]
