"""2D phase unwrapping (phase_unwrapping-module parity).

Reference anchor: HistogramPhaseUnwrapping
(phase_unwrapping/src/histogramphaseunwrapping.cpp) — quality-guided
unwrapping. TPU-first equivalent: the unweighted least-squares DCT solver
(Ghiglia-Romero), which solves the same Poisson problem as one global
batched transform instead of a sequential quality-sorted flood fill.
"""

from opencv_contrib_tpu.phase_unwrapping.unwrap import unwrap_phase_dct, wrap

__all__ = ["unwrap_phase_dct", "wrap"]
