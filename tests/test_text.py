"""Text module tests: SWT and ER on synthetic glyph scenes, plus the CCL op."""

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.ops import ccl
from opencv_contrib_tpu.text import er, swt


def _glyph_image(shape=(96, 160), stroke=3):
    """White background with dark bar-glyph 'letters' of constant stroke
    width, arranged on a line (synthetic 'HI II' text)."""
    img = np.ones(shape, np.float32)
    xs = [30, 50, 70, 90]
    for x in xs:
        img[30:66, x : x + stroke] = 0.0  # vertical bar "letters"
    return img


class TestCcl:
    def test_two_components(self):
        m = np.zeros((16, 16), bool)
        m[2:5, 2:5] = True
        m[10:14, 9:15] = True
        labels, _ = ccl.connected_components(jnp.asarray(m))
        lab = np.asarray(labels)
        ids = np.unique(lab[lab >= 0])
        assert len(ids) == 2
        assert (lab[2:5, 2:5] == lab[2, 2]).all()
        assert (lab[10:14, 9:15] == lab[10, 9]).all()
        assert lab[0, 0] == -1

    def test_stats(self):
        m = np.zeros((16, 16), bool)
        m[2:5, 2:6] = True
        labels, _ = ccl.connected_components(jnp.asarray(m))
        st = ccl.component_stats(labels, values=jnp.ones((16, 16)), max_components=8)
        area = np.asarray(st["area"])
        assert area[np.asarray(st["valid"])].tolist() == [12.0]
        i = int(np.argmax(area))
        assert (float(st["y0"][i]), float(st["x0"][i]), float(st["y1"][i]), float(st["x1"][i])) == (2, 2, 4, 5)

    def test_snake_component(self):
        # long connected snake exercises pointer-jumping convergence
        m = np.zeros((20, 20), bool)
        for r in range(0, 20, 2):
            m[r, :] = True
            if (r // 2) % 2 == 0:
                m[min(r + 1, 19), -1] = True
            else:
                m[min(r + 1, 19), 0] = True
        labels, _ = ccl.connected_components(jnp.asarray(m), connectivity=4)
        lab = np.asarray(labels)
        assert len(np.unique(lab[lab >= 0])) == 1


class TestSwt:
    def test_stroke_width_recovers_bar_width(self):
        img = _glyph_image(stroke=4)
        m = np.asarray(swt.stroke_width_map(jnp.asarray(img), max_width=16))
        inside = m[40:60, 50:54]
        vals = inside[inside > 0]
        assert vals.size > 10
        assert 2.0 <= np.median(vals) <= 6.0

    def test_detect_groups_letters_into_line(self):
        img = _glyph_image()
        boxes, letters = swt.detect_text(img, max_width=16)
        assert letters.shape[0] >= 3
        assert boxes.shape[0] >= 1
        # the dominant word box spans the bar row
        spans = boxes[:, 3] - boxes[:, 1]
        b = boxes[np.argmax(spans)]
        assert b[0] <= 32 and b[2] >= 62
        assert b[1] <= 33 and b[3] >= 88

    def test_blank_image_no_text(self):
        boxes, letters = swt.detect_text(np.ones((64, 64), np.float32))
        assert boxes.shape[0] == 0


class TestEr:
    def test_detects_dark_glyphs(self):
        img = _glyph_image(stroke=4)
        boxes, probs = er.er_detect(img, n_levels=8, max_components=64)
        assert boxes.shape[0] >= 2
        # at least one detected region overlaps a bar
        hit = False
        for b in boxes:
            if b[0] <= 35 and b[2] >= 60 and b[1] <= 52 and b[3] >= 50:
                hit = True
        assert hit

    def test_prob_filters_noise(self):
        rng = np.random.default_rng(0)
        noise = rng.uniform(0.4, 0.6, (64, 64)).astype(np.float32)
        boxes, probs = er.er_detect(noise, n_levels=8, max_components=64, min_area=20)
        img = _glyph_image(stroke=4)
        boxes_t, _ = er.er_detect(img, n_levels=8, max_components=64, min_area=20)
        assert boxes_t.shape[0] >= boxes.shape[0]
