"""2D curve plotting to images (plot-module parity: Plot2d, plot.hpp)."""

from opencv_contrib_tpu.plot.render import plot2d

__all__ = ["plot2d"]
