"""Device glyph compositor: kernel parity vs numpy, layout parity vs the
host font engine, page compositing vs the host score-map fill."""
import numpy as np
import pytest

from tests.engine.fixtures import build_font_collection
from vkit_tpu.element import Image
from vkit_tpu.engine.font import (
    FontEngineRunConfig,
    FontEngineRunConfigGlyphSequence,
    font_freetype_default_engine_executor_factory,
)
from vkit_tpu.engine.font.atlas import (
    get_glyph_atlas,
    placements_for_text_lines,
    plan_text_line_layout,
)
from vkit_tpu.ops.glyph import (
    accumulate_glyph_alpha,
    build_placements,
    composite_glyphs,
)


@pytest.fixture(scope='module')
def font_variant():
    collection = build_font_collection()
    return collection.font_metas[0].get_font_variant(0)


def np_resample_weights(out_len, tap_len, src, dst):
    weights = np.zeros((out_len, tap_len), dtype=np.float64)
    for i in range(out_len):
        if i >= dst:
            continue
        coord = (i + 0.5) * src / max(dst, 1) - 0.5
        k0 = int(np.floor(coord))
        frac = coord - k0
        if 0 <= k0 < tap_len:
            weights[i, k0] += 1 - frac
        if 0 <= k0 + 1 < tap_len:
            weights[i, k0 + 1] += frac
    return weights


def np_composite(canvas, tiles, rows, out_tile):
    out = canvas.astype(np.float64)
    for row in rows:
        tile = tiles[row['glyph_id']].astype(np.float64)
        w_y = np_resample_weights(
            out_tile, tile.shape[0], row['src_h'], row['dst_h'])
        w_x = np_resample_weights(
            out_tile, tile.shape[1], row['src_w'], row['dst_w'])
        alpha = np.clip(w_y @ tile @ w_x.T, 0, 1)
        n, h, w, c = out.shape
        for dy in range(out_tile):
            for dx in range(out_tile):
                y, x = row['up'] + dy, row['left'] + dx
                if 0 <= y < h and 0 <= x < w:
                    a = alpha[dy, dx]
                    out[row['sample_id'], y, x] = (
                        a * np.asarray(row['color'])
                        + (1 - a) * out[row['sample_id'], y, x]
                    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def test_composite_matches_numpy_reference():
    rng = np.random.default_rng(0)
    tiles = rng.random((5, 12, 12), dtype=np.float32)
    canvas = rng.integers(0, 256, (2, 48, 64, 3), dtype=np.uint8)
    rows = []
    for idx in range(9):
        src_h, src_w = rng.integers(4, 13, 2)
        dst_h, dst_w = rng.integers(3, 17, 2)
        rows.append({
            'glyph_id': int(rng.integers(0, 5)),
            'sample_id': idx % 2,
            'up': int(rng.integers(-4, 40)),
            'left': int(rng.integers(-4, 56)),
            'dst_h': int(dst_h), 'dst_w': int(dst_w),
            'src_h': float(src_h), 'src_w': float(src_w),
            'color': np.array([250.0, 10.0, 80.0], dtype=np.float32),
        })
    placements = build_placements(rows, bucket=16)
    got = np.asarray(composite_glyphs(canvas, tiles, placements, out_tile=16))
    want = np_composite(canvas, tiles, rows, out_tile=16)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_composite_identity_scale_exact():
    """dst == src: weights are an identity selection, tile blends exactly."""
    rng = np.random.default_rng(1)
    tiles = np.zeros((1, 8, 8), dtype=np.float32)
    tiles[0, 1:7, 1:7] = 1.0
    canvas = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    rows = [{
        'glyph_id': 0, 'sample_id': 0, 'up': 10, 'left': 12,
        'dst_h': 8, 'dst_w': 8, 'src_h': 8.0, 'src_w': 8.0,
        'color': np.array([0.0, 0.0, 0.0], dtype=np.float32),
    }]
    placements = build_placements(rows, bucket=8)
    got = np.asarray(composite_glyphs(canvas, tiles, placements, out_tile=8))
    want = canvas.copy()
    want[0, 11:17, 13:19] = 0
    np.testing.assert_array_equal(got, want)


def test_accumulate_alpha_is_max():
    tiles = np.full((1, 4, 4), 0.5, dtype=np.float32)
    base = np.zeros((1, 16, 16), dtype=np.float32)
    base[0, 5, 5] = 0.9
    rows = [{
        'glyph_id': 0, 'sample_id': 0, 'up': 4, 'left': 4,
        'dst_h': 4, 'dst_w': 4, 'src_h': 4.0, 'src_w': 4.0,
        'color': np.array([1.0], dtype=np.float32),
    }]
    placements = build_placements(rows, num_channels=1, bucket=8)
    got = np.asarray(accumulate_glyph_alpha(base, tiles, placements, out_tile=8))
    assert got[0, 5, 5] == pytest.approx(0.9)
    assert got[0, 4, 4] == pytest.approx(0.5)
    assert got[0, 12, 12] == 0.0


@pytest.mark.parametrize('text,height,width', [
    ('Hello World', 32, 300),
    ('pack my box with five dozen jugs', 24, 420),
    ('Trimmed beyond the box edge for sure', 28, 150),
])
def test_layout_matches_host_engine(font_variant, text, height, width):
    executor = font_freetype_default_engine_executor_factory.create()
    run_config = FontEngineRunConfig(
        height=height, width=width, chars=list(text),
        font_variant=font_variant,
    )
    text_line = executor.run(run_config, np.random.default_rng(7))
    layout = plan_text_line_layout(run_config, np.random.default_rng(7))
    if text_line is None:
        assert layout is None
        return
    assert layout is not None
    assert layout.text == text_line.text
    assert (layout.height, layout.width) == text_line.image.shape
    assert len(layout.char_boxes) == len(text_line.char_boxes)
    for got, want in zip(layout.char_boxes, text_line.char_boxes):
        assert got.char == want.char
        assert got.box == want.box


def test_device_page_close_to_host_fill(font_variant):
    """Composite two text lines onto a page batch on device; compare with
    the host path (TextLine score-map alpha fill, the page assembler's
    text-line rule).  Boxes are exact; pixels differ only by per-glyph vs
    whole-line resampling."""
    texts = ['Hello World', 'pack my box']
    color = (20, 30, 180)
    anchors = [(10, 8), (60, 40)]

    canvas_host = np.full((1, 120, 360, 3), 230, dtype=np.uint8)
    canvas_dev = canvas_host.copy()

    entries = []
    atlas = None
    for text, (up, left) in zip(texts, anchors):
        run_config = FontEngineRunConfig(
            height=32, width=320, chars=list(text),
            font_variant=font_variant,
        )
        executor = font_freetype_default_engine_executor_factory.create()
        text_line = executor.run(run_config, np.random.default_rng(3))
        layout = plan_text_line_layout(run_config, np.random.default_rng(3))
        assert text_line is not None and layout is not None
        atlas = atlas or get_glyph_atlas(run_config)

        # Host: alpha fill into the page (page_assembler text-line rule).
        alpha = text_line.score_map.mat
        h, w = alpha.shape
        region = canvas_host[0, up:up + h, left:left + w].astype(np.float64)
        blended = alpha[..., None] * np.asarray(color) \
            + (1 - alpha[..., None]) * region
        canvas_host[0, up:up + h, left:left + w] = np.clip(
            np.round(blended), 0, 255
        ).astype(np.uint8)

        entries.append((layout, (up, left), 0, color))

    placements, out_tile = placements_for_text_lines(entries, bucket=64)
    got = np.asarray(composite_glyphs(
        Image(mat=canvas_dev[0]).mat[None], atlas.tiles, placements,
        out_tile=out_tile,
    ))

    diff = np.abs(got.astype(int) - canvas_host.astype(int))
    # Identical where no ink was painted by either path.
    changed_host = (canvas_host != 230).any(axis=-1)
    changed_dev = (got != 230).any(axis=-1)
    # Ink footprints agree except at anti-aliased borders.
    mismatch = (changed_host != changed_dev).mean()
    assert mismatch < 0.02
    assert diff.mean() < 4.0
