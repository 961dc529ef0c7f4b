"""Bio-inspired retina model (bioinspired-module parity).

Reference anchors: Retina (bioinspired/include/opencv2/bioinspired/
retina.hpp:162 — parvocellular detail/color pathway + magnocellular motion
pathway, photoreceptor local adaptation) and
TransientAreasSegmentationModule (transientareassegmentationmodule.hpp:122).

TPU-first: the retina's spatiotemporal filters are separable IIR/Gaussian
stages on image state carried frame to frame — one jitted step.
"""

from opencv_contrib_tpu.bioinspired.retina import Retina, RetinaState
from opencv_contrib_tpu.bioinspired.transient import TransientState, transient_create, transient_run
from opencv_contrib_tpu.bioinspired.color import (
    bayer_masks,
    color_multiplex,
    color_demultiplex,
    fast_tone_mapping,
    retina_run_color,
)

__all__ = ["Retina", "RetinaState", "TransientState", "transient_create", "transient_run",
           "bayer_masks", "color_multiplex", "color_demultiplex", "fast_tone_mapping",
           "retina_run_color"]
