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


class TestQrFullRange:
    """Versions 1-40 x modes x ECC levels (zxing version.hpp:55 /
    decoded_bit_stream_parser.cpp:50 parity surface)."""

    def test_versions_and_levels_roundtrip(self):
        from opencv_contrib_tpu.wechat_qrcode import spec
        for ver in (1, 2, 5, 10, 25, 40):
            for lvl in ("L", "M", "Q", "H"):
                cap = spec.total_data_codewords(ver, lvl)
                text = "x" * max(1, cap - 5)
                mod = encode(text, mask_id=ver % 8, version=ver, level=lvl)
                assert mod.shape[0] == spec.dimension(ver)
                assert decode_matrix(mod) == text, f"v{ver}-{lvl}"

    def test_numeric_mode(self):
        for text in ("1", "12", "123", "0123456789" * 30):
            mod = encode(text, level="M")
            assert decode_matrix(mod) == text

    def test_alphanumeric_mode(self):
        for text in ("A", "AC-42", "HELLO WORLD $%*+-./:"):
            mod = encode(text, level="Q")
            assert decode_matrix(mod) == text

    def test_kanji_mode(self):
        text = "点茗"  # two Shift-JIS double-byte chars
        from opencv_contrib_tpu.wechat_qrcode.qr import _pick_mode, MODE_KANJI
        assert _pick_mode(text) == MODE_KANJI
        mod = encode(text, level="L")
        assert decode_matrix(mod) == text

    def test_byte_mode_utf8(self):
        text = "café ☃ bytes"
        mod = encode(text, level="M")
        assert decode_matrix(mod) == text

    def test_auto_version_selection(self):
        from opencv_contrib_tpu.wechat_qrcode.qr import choose_version
        assert choose_version("HI", "L") == 1
        assert choose_version("x" * 100, "L") > 2
        v = choose_version("x" * 2900, "L")
        assert v == 40

    def test_interleaved_block_damage_corrected(self, rng):
        # v5-Q has 2+2 blocks with 18 ec each: flip bursts of modules and
        # require the per-block RS de-interleaving to recover
        text = "BLOCK INTERLEAVING TEST PAYLOAD 0123456789"
        mod = encode(text, mask_id=1, version=5, level="Q")
        bad = mod.copy()
        for y, x in [(20, 12), (20, 13), (21, 12), (15, 25), (16, 25)]:
            bad[y, x] ^= 1
        assert decode_matrix(bad) == text

    def test_rendered_decode_midsize(self):
        text = "https://example.com/path?q=tpu-qr"
        img = render(encode(text, mask_id=2, level="M"), scale=6, border=4)
        out, _ = detect_and_decode(img)
        assert out == text

    def test_rendered_decode_perspective(self):
        from opencv_contrib_tpu.wechat_qrcode.qr import _perspective_from_4
        import jax.numpy as jnp
        from opencv_contrib_tpu.ops.image import sample_bilinear

        text = "PERSPECTIVE AT VERSION FOUR 0123456789"
        img = render(encode(text, mask_id=5, level="M"), scale=8, border=6)
        H0, W0 = img.shape
        src = np.array([[0, 0], [0, W0 - 1], [H0 - 1, 0], [H0 - 1, W0 - 1]], float)
        dst = src + np.array([[6, 9], [3, -7], [-5, 6], [8, -4]], float)
        Hm = _perspective_from_4([(r, c) for r, c in dst],
                                 [(r, c) for r, c in src])
        yy, xx = np.meshgrid(np.arange(H0), np.arange(W0), indexing="ij")
        p = np.stack([xx, yy, np.ones_like(xx)], -1) @ Hm.T
        warped = np.asarray(sample_bilinear(
            jnp.asarray(img), jnp.asarray(p[..., 1] / p[..., 2]),
            jnp.asarray(p[..., 0] / p[..., 2])))
        out, _ = detect_and_decode(warped)
        assert out == text


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
