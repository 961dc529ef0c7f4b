"""Structured light (structured_light-module parity).

Reference anchors: GrayCodePattern
(structured_light/src/graycodepattern.cpp — generate + decode with
white/black thresholding) and SinusoidalPattern PSP
(sinusoidalpattern.cpp) with phase via phase_unwrapping.
"""

from opencv_contrib_tpu.structured_light.graycode import (
    generate_graycode_patterns,
    decode_graycode,
)
from opencv_contrib_tpu.structured_light.sinusoidal import (
    generate_psp_patterns,
    compute_psp_phase,
)

__all__ = [
    "generate_graycode_patterns",
    "decode_graycode",
    "generate_psp_patterns",
    "compute_psp_phase",
]
