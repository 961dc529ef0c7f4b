"""Image-processing primitives (the build's L1/L2: the role cudev +
cudaarithm/cudafilters/cudawarping/cudaimgproc play in the reference)."""

from opencv_contrib_tpu.ops import ccl, filters, histogram, image, integral, morphology, template_match

__all__ = ["ccl", "filters", "histogram", "image", "integral", "morphology", "template_match"]
