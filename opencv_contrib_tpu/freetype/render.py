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

    @staticmethod
    def _expand(rows) -> np.ndarray:
        g = np.zeros((_GLYPH_H, _GLYPH_W), np.float32)
        for y, bits in enumerate(rows):
            for x in range(_GLYPH_W):
                if bits >> x & 1:
                    g[y, x] = 1.0
        return g

    def load_font_data(self, path: str, id: int = 0):
        """Load a custom glyph atlas from .npz (keys = str(codepoint))."""
        data = np.load(path)
        atlas = {int(k): np.asarray(v, np.float32) for k, v in data.items()}
        if atlas:
            self._atlas = atlas
            self._gh, self._gw = next(iter(atlas.values())).shape

    def get_text_size(self, text: str, font_height: int,
                      thickness: int = 1) -> Tuple[int, int]:
        """Pixel (width, height) of the rendered string
        (freetype.hpp getTextSize)."""
        scale = max(1, font_height) / self._gh
        w = int(np.ceil(len(text) * self._gw * scale)) + 2 * max(0, thickness - 1)
        h = int(np.ceil(self._gh * scale)) + 2 * max(0, thickness - 1)
        return w, h

    def render_mask(self, text: str, font_height: int,
                    thickness: int = 1) -> np.ndarray:
        """Rasterize `text` to a float32 coverage mask in [0,1]."""
        if not text:
            return np.zeros((max(1, font_height), 1), np.float32)
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
            # emboldening = max-dilation of the coverage mask
            r = thickness - 1
            padded = np.pad(strip, r)
            out = np.zeros_like(padded)
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    if dy * dy + dx * dx <= r * r + 1:
                        out = np.maximum(out, np.roll(np.roll(padded, dy, 0),
                                                      dx, 1))
            strip = out
        return strip

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
