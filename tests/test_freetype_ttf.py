"""Real TTF parsing for the freetype module (freetype/ttf.py).

Reference contract: cv::freetype::FreeType2::loadFontData renders
arbitrary TrueType fonts (freetype/src/freetype.cpp); these tests parse
the open-license DejaVuSans (shipped by matplotlib) and require correct
glyph shapes, proportional advance widths, and kern-pair layout."""

import numpy as np
import pytest

from opencv_contrib_tpu.freetype.ttf import TtfFont, find_system_ttf

FONT = find_system_ttf()
pytestmark = pytest.mark.skipif(FONT is None,
                                reason="no system DejaVuSans.ttf")


@pytest.fixture(scope="module")
def font():
    return TtfFont(FONT)


class TestTtfParsing:
    def test_tables_and_cmap(self, font):
        assert font.units_per_em in (1000, 2048)
        assert font.n_glyphs > 1000
        assert font.glyph_id(ord("A")) != 0
        assert font.glyph_id(ord("a")) != font.glyph_id(ord("A"))
        assert font.glyph_id(0x10FF00) == 0  # unmapped -> .notdef

    def test_proportional_advances(self, font):
        _, adv_i, _, _ = font.rasterize(ord("i"), 32)
        _, adv_w, _, _ = font.rasterize(ord("W"), 32)
        assert adv_w > 1.8 * adv_i

    def test_kerning_pairs_loaded(self, font):
        assert len(font.kern) > 100
        # classic negative pair in DejaVu
        k = font.kerning(ord("A"), ord("V"), 64)
        assert k < 0

    def test_glyph_shape_O_has_hole(self, font):
        bm, _, _, _ = font.rasterize(ord("O"), 48)
        h, w = bm.shape
        # center of 'O' is the counter (hole): non-zero winding must
        # leave it empty; the rim must be inked
        assert bm[h // 2, w // 2] < 0.2
        assert bm[h // 2, 1] > 0.3 or bm[h // 2, 2] > 0.3

    def test_composite_glyph_renders(self, font):
        # accented capital A-acute is a composite (base + accent)
        bm, adv, _, _ = font.rasterize(0x00C1, 40)
        base, _, _, _ = font.rasterize(ord("A"), 40)
        assert bm.shape[0] > base.shape[0]  # accent adds height
        assert bm.sum() > base.sum()


class TestFreeType2TtfPath:
    def test_put_text_from_ttf(self, tmp_path):
        from opencv_contrib_tpu.freetype import create_freetype2

        ft = create_freetype2()
        ft.load_font_data(FONT)
        img = np.zeros((64, 256, 3), np.float32)
        out = np.asarray(ft.put_text(img, "AVA il", (8, 8), 32,
                                     (1.0, 0.5, 0.2)))
        assert out.max() > 0.9
        assert (out > 0.1).any(axis=-1).sum() > 150  # real coverage

    def test_kerned_width_shorter(self):
        from opencv_contrib_tpu.freetype import create_freetype2

        ft = create_freetype2()
        ft.load_font_data(FONT)
        w_av, _ = ft.get_text_size("AV", 64)
        w_a, _ = ft.get_text_size("A", 64)
        w_v, _ = ft.get_text_size("V", 64)
        # kerning pulls AV closer than the sum of individual widths
        assert w_av < w_a + w_v

    def test_text_size_matches_mask(self):
        from opencv_contrib_tpu.freetype import create_freetype2

        ft = create_freetype2()
        ft.load_font_data(FONT)
        w, h = ft.get_text_size("Hello", 24)
        mask = ft.render_mask("Hello", 24)
        assert abs(mask.shape[1] - w) <= 3
        assert abs(mask.shape[0] - h) <= 3
