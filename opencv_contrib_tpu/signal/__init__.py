"""1-D signal processing (signal-module parity: signal_resample.cpp)."""

from opencv_contrib_tpu.signal.resample import resample_signal

__all__ = ["resample_signal"]
