"""Pallas TPU kernels for the hot ops (the cudev-layer analog, SURVEY P3).

Kernels fall back to `interpret=True` automatically off-TPU so the same
tests run on the CPU backend (the reference's CPU/OpenCL dual-backend test
pattern, SURVEY §4 pattern 4).
"""

from opencv_contrib_tpu.ops.pallas import matching
from opencv_contrib_tpu.ops.pallas.remap import remap_bounded, remap_bounded_xla

__all__ = ["matching", "remap_bounded", "remap_bounded_xla"]
