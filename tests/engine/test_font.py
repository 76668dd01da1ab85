import numpy as np
import pytest

from tests.engine.fixtures import build_font_collection
from vkit_tpu.engine.font import (
    FontEngineRunConfig,
    FontEngineRunConfigGlyphSequence,
    font_freetype_default_engine_executor_factory,
    font_freetype_lcd_engine_executor_factory,
    font_freetype_monochrome_engine_executor_factory,
)


@pytest.fixture(scope='module')
def font_variant():
    collection = build_font_collection()
    return collection.font_metas[0].get_font_variant(0)


def run_engine(factory, font_variant, chars, height=32, width=300, **kwargs):
    executor = factory.create()
    run_config = FontEngineRunConfig(
        height=height,
        width=width,
        chars=chars,
        font_variant=font_variant,
        **kwargs,
    )
    return executor.run(run_config, np.random.default_rng(0))


def test_default_engine_renders_text(font_variant):
    text_line = run_engine(
        font_freetype_default_engine_executor_factory, font_variant, list('Hello World')
    )
    assert text_line is not None
    assert text_line.image.height == 32
    assert text_line.image.width <= 300
    # 10 non-space chars.
    assert len(text_line.char_boxes) == 10
    assert text_line.text == 'Hello World'
    assert text_line.is_hori
    # Ink present and mask aligns with dark pixels.
    assert text_line.mask.mat.sum() > 50
    ink = text_line.image.mat[text_line.mask.np_mask]
    assert ink.mean() < 250

    # Char boxes ordered left to right.
    lefts = [char_box.left for char_box in text_line.char_boxes]
    assert lefts == sorted(lefts)


def test_char_boxes_cover_ink(font_variant):
    text_line = run_engine(
        font_freetype_default_engine_executor_factory, font_variant, list('AB')
    )
    assert text_line is not None
    for char_box in text_line.char_boxes:
        sub = char_box.box.extract_mask(text_line.mask)
        assert sub.mat.any(), char_box.char


def test_split_and_polygons(font_variant):
    text_line = run_engine(
        font_freetype_default_engine_executor_factory, font_variant,
        list('foo bar'),
    )
    assert text_line is not None
    parts = text_line.split()
    assert len(parts) == 2
    assert parts[0].text == 'foo'
    assert parts[1].text == 'bar'

    polygon = text_line.to_polygon()
    assert polygon.num_points >= 4
    char_polygons = text_line.to_char_polygons(page_height=100, page_width=400)
    assert len(char_polygons) == len(text_line.char_boxes)


def test_vert_sequence(font_variant):
    text_line = run_engine(
        font_freetype_default_engine_executor_factory, font_variant,
        list('Vert'),
        height=300, width=32,
        glyph_sequence=FontEngineRunConfigGlyphSequence.VERT_DEFAULT,
    )
    assert text_line is not None
    assert not text_line.is_hori
    assert text_line.image.width == 32
    ups = [char_box.up for char_box in text_line.char_boxes]
    assert ups == sorted(ups)


def test_lcd_engine(font_variant):
    text_line = run_engine(
        font_freetype_lcd_engine_executor_factory, font_variant, list('LCD')
    )
    assert text_line is not None
    assert text_line.char_glyphs[0].image.mat.ndim == 3


def test_monochrome_engine(font_variant):
    text_line = run_engine(
        font_freetype_monochrome_engine_executor_factory, font_variant, list('Mono')
    )
    assert text_line is not None
    # Mono glyph alphas are 0/1 only.
    alphas = np.unique(text_line.char_glyphs[0].score_map.mat)
    assert set(np.round(alphas, 3)).issubset({0.0, 1.0})


def test_trim_long_text(font_variant):
    text_line = run_engine(
        font_freetype_default_engine_executor_factory, font_variant,
        list('This is a very long line of text that cannot possibly fit'),
        height=32, width=120,
    )
    # Either trimmed to fit or None.
    if text_line is not None:
        assert text_line.image.width <= 120
        assert len(text_line.char_boxes) < len('Thisisavery...')


def test_font_collection_filtering():
    collection = build_font_collection()
    metas = collection.filter_font_metas('Hi!')
    assert len(metas) == 2
    assert collection.filter_font_metas(['中']) == []
