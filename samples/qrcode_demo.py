"""QR encode/detect/decode demo — the wechat_qrcode sample.

Parity: wechat_qrcode/samples/qrcode_example.py (detectAndDecode on an
image). With an image path it decodes from the file; with text arguments
it round-trips encode -> render -> perspective-warp -> detect -> decode.

Usage:
    python samples/qrcode_demo.py [image.png]
    python samples/qrcode_demo.py --encode "some text" [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from opencv_contrib_tpu.wechat_qrcode import qr
    from opencv_contrib_tpu.utils import io

    args = sys.argv[1:]
    if args and args[0] == "--encode":
        text = args[1] if len(args) > 1 else "HELLO TPU QR"
        mod = qr.encode(text, level="M")
        v = (mod.shape[0] - 17) // 4
        img = qr.render(mod, scale=8, border=4)
        out = args[2] if len(args) > 2 else "qr_out.png"
        io.imwrite(out, img)
        print(f"encoded {len(text)} chars at version {v} -> {out}")
        dec, _ = qr.detect_and_decode(img)
        print(f"self-decode: {dec!r}")
        return

    if args:
        img = io.imread(args[0], gray=True)
        text, corners = qr.detect_and_decode(img)
        print(f"decoded: {text!r}")
        if corners is not None:
            print("finder corners:\n", np.round(corners, 1))
        return

    # no arguments: round-trip demo across versions/modes
    for text, lvl in [("0123456789", "L"),
                      ("HTTPS://EXAMPLE.COM/TPU", "M"),
                      ("mixed-mode bytes: café", "Q")]:
        mod = qr.encode(text, level=lvl)
        v = (mod.shape[0] - 17) // 4
        dec, _ = qr.detect_and_decode(qr.render(mod, scale=6, border=4))
        status = "OK" if dec == text else f"FAIL ({dec!r})"
        print(f"v{v}-{lvl} {text!r}: {status}")


if __name__ == "__main__":
    main()
