"""Scene-text detection (the text module's detector families).

Parity targets (reference anchors):
- SWT text detection: text/src/swt_text_detection.cpp (SWTTextDetection —
  stroke width transform ray casting + letter candidates + chaining)
- ER filter: text/src/erfilter.cpp (Neumann-Matas extremal region cascade,
  ERFilter::run, text/include/opencv2/text/erfilter.hpp:118-151)

OCR heads:
- ocr.py — OCRHMMDecoder/OCRBeamSearchDecoder parity (glyph classifier +
  Viterbi/beam decoding, ocr_hmm_decoder.cpp, ocr_beamsearch_decoder.cpp)
- crnn.py — holistic CRNN recognizer trained in-repo on synthetic renders
  (ocr_holistic.cpp's role; the Tesseract wrapper stays out of scope —
  it shells out to an external engine upstream).
"""

from opencv_contrib_tpu.text import er, swt, ocr, crnn

__all__ = ["er", "swt", "ocr", "crnn"]
