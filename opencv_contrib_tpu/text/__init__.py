"""Scene-text detection (the text module's detector families).

Parity targets (reference anchors):
- SWT text detection: text/src/swt_text_detection.cpp (SWTTextDetection —
  stroke width transform ray casting + letter candidates + chaining)
- ER filter: text/src/erfilter.cpp (Neumann-Matas extremal region cascade,
  ERFilter::run, text/include/opencv2/text/erfilter.hpp:118-151)

OCR heads (Tesseract wrapper, HMM decoder) wrap external engines upstream
and are out of scope; the detector stages here produce the boxes those
consume.
"""

from opencv_contrib_tpu.text import er, swt

__all__ = ["er", "swt"]
