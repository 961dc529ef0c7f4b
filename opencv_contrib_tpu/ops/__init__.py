"""Image-processing primitives (the build's L1/L2: the role cudev +
cudaarithm/cudafilters/cudawarping/cudaimgproc play in the reference)."""

from opencv_contrib_tpu.ops import image, filters, integral, morphology, histogram

__all__ = ["image", "filters", "integral", "morphology", "histogram"]
