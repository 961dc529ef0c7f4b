"""QR code pipeline (the wechat_qrcode module's role).

Parity target: wechat_qrcode/src/* (WeChatQRCode::detectAndDecode,
wechat_qrcode.hpp:24,51): detector -> sampler -> zxing-derived decoder with
Reed-Solomon correction. The reference's CNN detector/super-resolution are
replaced by the classical finder-pattern ratio scan + affine grid sampling
(the zxing fallback path); the decode stack (format BCH, masks, zigzag
codewords, GF(256) RS) is complete for version-1 byte mode, with an
encoder for self-contained testing. Bit order is self-consistent
encoder<->decoder (rotations handled by trying all four).
"""

from opencv_contrib_tpu.wechat_qrcode import gf256, qr
from opencv_contrib_tpu.wechat_qrcode.qr import decode_matrix, detect_and_decode, encode, render

__all__ = ["gf256", "qr", "encode", "render", "detect_and_decode", "decode_matrix"]
