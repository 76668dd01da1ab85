"""PIL-backed shim of the freetype-py subset the reference's font engine
uses (vkit/engine/font/freetype.py:56-1175).

freetype-py is not installed here; PIL links the same FreeType underneath,
so glyph rasters and metrics come from ImageFont and are repackaged in the
freetype-py accessor shapes (bitmap buffer/rows/width/pitch, bitmap_top,
bitmap_left, advance in 26.6 fixed point).  LCD/mono render flags fall
back to the grayscale raster (the measurement pipeline runs the
freetype_default engine).
"""
from typing import Optional

import numpy as np
from PIL import Image as PilImage, ImageDraw, ImageFont

FT_LOAD_RENDER = 0x4
FT_LOAD_FORCE_AUTOHINT = 0x20
FT_LOAD_TARGET_LCD = 0x20000
FT_LOAD_TARGET_MONO = 0x30000


class Matrix:

    def __init__(self, xx=0x10000, xy=0, yx=0, yy=0x10000):
        self.xx, self.xy, self.yx, self.yy = xx, xy, yx, yy


class Vector:

    def __init__(self, x=0, y=0):
        self.x, self.y = x, y


class _Advance:

    def __init__(self, x: int, y: int = 0):
        self.x = x          # 26.6 fixed point
        self.y = y


class _Bitmap:

    def __init__(self, np_image: np.ndarray):
        self.rows = int(np_image.shape[0])
        self.width = int(np_image.shape[1])
        self.pitch = int(np_image.shape[1])
        self.buffer = np_image.reshape(-1).tolist()


class _GlyphSlot:

    def __init__(self, bitmap: _Bitmap, bitmap_top: int, bitmap_left: int,
                 advance: _Advance):
        self.bitmap = bitmap
        self.bitmap_top = bitmap_top
        self.bitmap_left = bitmap_left
        self.advance = advance


class Face:

    def __init__(self, path: str, index: int = 0):
        self._path = str(path)
        self._index = int(index)
        self._font: Optional[ImageFont.FreeTypeFont] = None
        self._mono = False
        self.glyph: Optional[_GlyphSlot] = None

    def set_char_size(self, width: int = 0, height: int = 0,
                      hres: int = 72, vres: int = 72):
        size = max(1, round((width or height) / 64))
        self._font = ImageFont.truetype(self._path, size=size,
                                        index=self._index)

    def set_transform(self, matrix: Matrix, vector: Vector):
        pass  # LCD horizontal compression: grayscale fallback

    def load_char(self, char: str, flags: int = FT_LOAD_RENDER):
        font = self._font
        assert font is not None, 'set_char_size must run first'
        ascent_font, descent = font.getmetrics()
        advance = font.getlength(char)
        pad = max(8, int(font.size))
        canvas_w = int(advance) + 2 * pad
        canvas_h = ascent_font + descent + 2 * pad
        canvas = PilImage.new('L', (canvas_w, canvas_h), 0)
        ImageDraw.Draw(canvas).text((pad, pad), char, fill=255, font=font)
        np_canvas = np.array(canvas, dtype=np.uint8)
        if flags & FT_LOAD_TARGET_MONO:
            np_canvas = np.where(np_canvas >= 128, 255, 0).astype(np.uint8)

        ys, xs = np.nonzero(np_canvas)
        if len(ys) == 0:
            np_image = np.zeros((0, 0), dtype=np.uint8)
            bitmap_top = 0
            bitmap_left = 0
        else:
            top, bottom = int(ys.min()), int(ys.max())
            left, right = int(xs.min()), int(xs.max())
            np_image = np_canvas[top:bottom + 1, left:right + 1]
            baseline_y = pad + ascent_font
            bitmap_top = baseline_y - top
            bitmap_left = left - pad

        self.glyph = _GlyphSlot(
            bitmap=_Bitmap(np.ascontiguousarray(np_image)),
            bitmap_top=bitmap_top,
            bitmap_left=bitmap_left,
            advance=_Advance(x=max(int(round(advance * 64)), 1), y=0),
        )
