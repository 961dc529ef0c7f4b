"""Utilities: synthetic fixtures, datasets, metrics, io, checkpointing."""

from opencv_contrib_tpu.utils import synthetic, sdf_scene, metrics, datasets, io, native

__all__ = ["synthetic", "sdf_scene", "metrics", "datasets", "io", "native"]
