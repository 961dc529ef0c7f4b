"""Core geometry + array types: SO(3)/SE(3), cameras, pyramids, color."""

from opencv_contrib_tpu.core import se3, camera, color, pyramid

__all__ = ["se3", "camera", "color", "pyramid"]
