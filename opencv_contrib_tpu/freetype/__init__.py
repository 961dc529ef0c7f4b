"""freetype — text rendering (reference: modules/freetype)."""

from opencv_contrib_tpu.freetype.render import (
    FreeType2, create_freetype2, put_text, get_text_size)

__all__ = ["FreeType2", "create_freetype2", "put_text", "get_text_size"]
