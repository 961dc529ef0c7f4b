"""Scene text demo — text/samples/{textdetection,cropped_word_recognition}.cpp role.

Renders text, detects character regions (SWT), and recognizes the string
with the HMM OCR (optionally lexicon-constrained beam search).

Usage:
    python samples/text_ocr_demo.py [TEXT]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.text import ocr, swt

    text = sys.argv[1].upper() if len(sys.argv) > 1 else "KINECT FUSION"
    img = ocr.render_text(text)
    print(f"rendered {text!r} as {img.shape} image")

    out = ocr.ocr_hmm(img)
    print(f"HMM OCR: {out!r}")

    lex = ["KINECT", "FUSION", "KERNEL", "FISSION"]
    out_b = ocr.ocr_hmm(img, lexicon=lex, use_beam=True)
    print(f"beam + lexicon: {out_b!r}")

    # stroke-width-based detection on the same image
    m = swt.stroke_width_map(jnp.asarray(img), dark_on_light=True)
    sw = np.asarray(m)
    print(f"SWT: {np.isfinite(sw[sw > 0]).sum()} stroke pixels, "
          f"median width {np.median(sw[sw > 0]):.1f}")


if __name__ == "__main__":
    main()
