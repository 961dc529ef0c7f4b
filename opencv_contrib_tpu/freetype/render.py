"""freetype — text rendering onto images.

Reference: modules/freetype (FreeType/HarfBuzz-backed
`cv::freetype::FreeType2::{loadFontData, putText, getTextSize}`,
freetype/include/opencv2/freetype.hpp). The TPU-native design keeps the
same API shape but renders from a built-in bitmap font atlas: glyph bitmaps
are expanded to a text raster on host (tiny), then blended into the device
image as one vectorized masked update — so annotating a batch of frames is
a single jitted composite, not a per-character draw loop. Antialiased
scaling uses the shared bilinear resize from ops.image.

`load_font_data(path)` additionally accepts a numpy .npz glyph atlas
({codepoint: (h, w) float mask}) so user fonts can be swapped in — the role
of FreeType2::loadFontData without linking FreeType.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opencv_contrib_tpu.freetype.font8x8 import FONT_8X8

_GLYPH_H = _GLYPH_W = 8


class FreeType2:
    """API twin of cv::freetype::FreeType2 (freetype.hpp:115-215)."""

    def __init__(self):
        self._atlas: Dict[int, np.ndarray] = {
            cp: self._expand(rows) for cp, rows in FONT_8X8.items()}
        self._gh, self._gw = _GLYPH_H, _GLYPH_W
        self._ttf = None
        self._ttf_cache: Dict[tuple, tuple] = {}

    @staticmethod
    def _expand(rows) -> np.ndarray:
        g = np.zeros((_GLYPH_H, _GLYPH_W), np.float32)
        for y, bits in enumerate(rows):
            for x in range(_GLYPH_W):
                if bits >> x & 1:
                    g[y, x] = 1.0
        return g

    def load_font_data(self, path: str, id: int = 0):
        """Load a real TrueType font (.ttf/.otf — parsed + rasterized by
        freetype.ttf, the FreeType2::loadFontData contract,
        freetype/src/freetype.cpp) or a .npz glyph atlas
        (keys = str(codepoint))."""
        if path.lower().endswith((".ttf", ".otf")):
            from opencv_contrib_tpu.freetype.ttf import TtfFont

            self._ttf = TtfFont(path)
            self._ttf_cache = {}
            return
        data = np.load(path)
        atlas = {int(k): np.asarray(v, np.float32) for k, v in data.items()}
        if atlas:
            self._atlas = atlas
            self._gh, self._gw = next(iter(atlas.values())).shape

    # -- TTF path (real outlines, per-glyph metrics, kerning) ---------------

    def _ttf_glyph(self, cp: int, px: int):
        key = (cp, px)
        if key not in self._ttf_cache:
            self._ttf_cache[key] = self._ttf.rasterize(cp, px)
        return self._ttf_cache[key]

    def _ttf_layout(self, text: str, font_height: int):
        """Pen positions + glyph bitmaps along the baseline, with kern
        adjustments. Returns (entries, width, ascent_px, descent_px)."""
        f = self._ttf
        scale = font_height / f.units_per_em
        asc = f.ascent * scale
        desc = -f.descent * scale
        pen = 0.0
        entries = []
        prev = None
        for ch in text:
            cp = ord(ch)
            if prev is not None:
                pen += f.kerning(prev, cp, font_height)
            bm, adv, bx, by = self._ttf_glyph(cp, font_height)
            entries.append((bm, pen + bx, by))
            pen += adv
            prev = cp
        return entries, pen, asc, desc

    def get_text_size(self, text: str, font_height: int,
                      thickness: int = 1) -> Tuple[int, int]:
        """Pixel (width, height) of the rendered string
        (freetype.hpp getTextSize)."""
        pad = 2 * max(0, thickness - 1)
        if self._ttf is not None:
            _, width, asc, desc = self._ttf_layout(text, max(1, font_height))
            return int(np.ceil(width)) + pad, int(np.ceil(asc + desc)) + pad
        scale = max(1, font_height) / self._gh
        w = int(np.ceil(len(text) * self._gw * scale)) + 2 * max(0, thickness - 1)
        h = int(np.ceil(self._gh * scale)) + 2 * max(0, thickness - 1)
        return w, h

    def render_mask(self, text: str, font_height: int,
                    thickness: int = 1) -> np.ndarray:
        """Rasterize `text` to a float32 coverage mask in [0,1]."""
        if not text:
            return np.zeros((max(1, font_height), 1), np.float32)
        if self._ttf is not None:
            strip = self._render_ttf(text, max(1, font_height))
            if thickness > 1:
                strip = self._embolden(strip, thickness - 1)
            return strip
        gh, gw = self._gh, self._gw
        strip = np.concatenate(
            [self._atlas.get(ord(c), self._atlas[0x3F]) for c in text], axis=1)
        scale = max(1, font_height) / gh
        if scale != 1.0:
            from opencv_contrib_tpu.ops import image as oimg
            out_h = int(round(gh * scale))
            out_w = int(round(strip.shape[1] * scale))
            strip = np.asarray(
                oimg.resize(jnp.asarray(strip)[:, :, None], (out_h, out_w)
                            )[:, :, 0], np.float32)
            strip = np.clip(strip, 0.0, 1.0)
        if thickness > 1:
            strip = self._embolden(strip, thickness - 1)
        return strip

    @staticmethod
    def _embolden(strip: np.ndarray, r: int) -> np.ndarray:
        """Emboldening = max-dilation of the coverage mask."""
        padded = np.pad(strip, r)
        out = np.zeros_like(padded)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dy * dy + dx * dx <= r * r + 1:
                    out = np.maximum(out, np.roll(np.roll(padded, dy, 0),
                                                  dx, 1))
        return out

    def _render_ttf(self, text: str, font_height: int) -> np.ndarray:
        """Compose per-glyph bitmaps along the baseline (advance widths +
        kern pairs from the font tables)."""
        entries, width, asc, desc = self._ttf_layout(text, font_height)
        H = int(np.ceil(asc + desc)) + 2
        W = int(np.ceil(width)) + 2
        canvas = np.zeros((H, W), np.float32)
        baseline = asc
        for bm, x, by in entries:
            h, w = bm.shape
            y0 = int(round(baseline - by))
            x0 = int(round(x))
            ya, xa = max(0, y0), max(0, x0)
            yb, xb = min(H, y0 + h), min(W, x0 + w)
            if yb <= ya or xb <= xa:
                continue
            sub = bm[ya - y0:yb - y0, xa - x0:xb - x0]
            canvas[ya:yb, xa:xb] = np.maximum(canvas[ya:yb, xa:xb], sub)
        return canvas

    def put_text(self, img, text: str, org: Tuple[int, int], font_height: int,
                 color, thickness: int = 1, bottom_left_origin: bool = False):
        """Blend `text` into img (H,W,C) or (H,W); org = top-left of the text
        box (or bottom-left if bottom_left_origin, matching putText's
        Point org semantics in freetype.hpp:152)."""
        mask = self.render_mask(text, font_height, thickness)
        mh, mw = mask.shape
        x0, y0 = int(org[0]), int(org[1])
        if bottom_left_origin:
            y0 = y0 - mh
        img = jnp.asarray(img)
        grey = img.ndim == 2
        if grey:
            img = img[:, :, None]
        H, W, C = img.shape
        # clip the text raster to the image
        sx, sy = max(0, -x0), max(0, -y0)
        ex = min(mw, W - x0)
        ey = min(mh, H - y0)
        if ex <= sx or ey <= sy:
            return img[:, :, 0] if grey else img
        sub = jnp.asarray(mask[sy:ey, sx:ex])[:, :, None]
        col = jnp.broadcast_to(jnp.asarray(color, img.dtype).reshape(-1)[:C],
                               (ey - sy, ex - sx, C))
        patch = jax.lax.dynamic_slice(img, (y0 + sy, x0 + sx, 0),
                                      (ey - sy, ex - sx, C))
        blended = patch * (1.0 - sub) + col * sub
        out = jax.lax.dynamic_update_slice(img, blended.astype(img.dtype),
                                           (y0 + sy, x0 + sx, 0))
        return out[:, :, 0] if grey else out


@functools.lru_cache(maxsize=1)
def _default() -> FreeType2:
    return FreeType2()


def create_freetype2() -> FreeType2:
    """Factory (cv::freetype::createFreeType2, freetype.hpp:219)."""
    return FreeType2()


def put_text(img, text, org, font_height, color, thickness: int = 1,
             bottom_left_origin: bool = False):
    return _default().put_text(img, text, org, font_height, color,
                               thickness, bottom_left_origin)


def get_text_size(text, font_height, thickness: int = 1):
    return _default().get_text_size(text, font_height, thickness)
