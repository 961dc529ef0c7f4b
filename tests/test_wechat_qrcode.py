"""QR pipeline tests: RS codec, matrix roundtrip, image detect+decode."""

import numpy as np

from opencv_contrib_tpu.wechat_qrcode import decode_matrix, detect_and_decode, encode, render
from opencv_contrib_tpu.wechat_qrcode.gf256 import rs_decode, rs_encode


class TestRs:
    def test_corrects_three_errors(self, rng):
        data = list(rng.integers(0, 256, 19))
        cw = rs_encode(data, 7)
        bad = list(cw)
        for i in rng.choice(len(bad), 3, replace=False):
            bad[i] ^= int(rng.integers(1, 256))
        out, ok = rs_decode(bad, 7)
        assert ok and out == data

    def test_rejects_too_many_errors(self, rng):
        data = list(rng.integers(0, 256, 19))
        cw = rs_encode(data, 7)
        bad = list(cw)
        for i in rng.choice(len(bad), 6, replace=False):
            bad[i] ^= int(rng.integers(1, 256))
        out, ok = rs_decode(bad, 7)
        assert not ok or out != data  # must not silently "correct"


class TestQrMatrix:
    def test_roundtrip_all_masks(self):
        for mask in range(8):
            mod = encode("HELLO TPU", mask_id=mask)
            assert decode_matrix(mod) == "HELLO TPU", f"mask {mask}"

    def test_roundtrip_rotations(self):
        mod = encode("ROT")
        for k in range(4):
            assert decode_matrix(np.rot90(mod, k)) == "ROT"

    def test_module_damage_corrected(self, rng):
        mod = encode("DAMAGE OK")
        # flip one full codeword's worth of modules in the data area
        bad = mod.copy()
        bad[12, 12] ^= 1
        bad[12, 13] ^= 1
        bad[13, 12] ^= 1
        assert decode_matrix(bad) == "DAMAGE OK"


class TestQrImage:
    def test_detect_and_decode_clean(self):
        img = render(encode("IMG TEST"), scale=4)
        text, corners = detect_and_decode(img)
        assert text == "IMG TEST"
        assert corners.shape == (3, 2)

    def test_detect_with_noise_and_offset(self, rng):
        img = render(encode("NOISY!"), scale=5, border=6)
        img = np.clip(img + rng.normal(0, 0.05, img.shape).astype(np.float32), 0, 1)
        text, _ = detect_and_decode(img)
        assert text == "NOISY!"

    def test_no_code_returns_none(self, rng):
        img = rng.uniform(0, 1, (80, 80)).astype(np.float32)
        text, _ = detect_and_decode(img)
        assert text is None
