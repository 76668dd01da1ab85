import numpy as np
import pytest

from tests.engine.fixtures import ASCII_CHARS, build_font_collection
from vkit_tpu.element import Lexicon, LexiconCollection, Polygon
from vkit_tpu.engine.barcode import (
    barcode_code39_engine_executor_factory,
    barcode_qr_engine_executor_factory,
)
from vkit_tpu.engine.char_and_font_sampler import (
    char_and_font_sampler_engine_executor_factory,
)
from vkit_tpu.engine.char_heatmap import char_heatmap_engine_executor_aggregator_factory
from vkit_tpu.engine.char_mask import (
    char_mask_default_engine_executor_factory,
    char_mask_external_ellipse_engine_executor_factory,
)
from vkit_tpu.engine.char_sampler import (
    CharSamplerEngineRunConfig,
    char_sampler_engine_executor_aggregator_factory,
)
from vkit_tpu.engine.seal_impression import (
    fill_text_line_to_seal_impression,
    seal_impression_ellipse_engine_executor_factory,
)
from vkit_tpu.engine.font import FontEngineRunConfig
from vkit_tpu.engine.font.pil_font import FontFreetypeDefaultEngine


def build_lexicon_collection():
    from vkit_tpu.utility.text import LexiconType, get_lexicon_type
    lexicons = []
    for char in ASCII_CHARS:
        tag = get_lexicon_type(char).value
        lexicons.append(Lexicon(char=char, tags=[tag]))
    return LexiconCollection(lexicons=lexicons)


@pytest.fixture(scope='module')
def lexicon_collection():
    return build_lexicon_collection()


@pytest.fixture(scope='module')
def char_sampler_aggregator(lexicon_collection, tmp_path_factory):
    corpus_file = tmp_path_factory.mktemp('corpus') / 'corpus.txt'
    corpus_file.write_text(
        '\n'.join([
            'the quick brown fox jumps over the lazy dog',
            'pack my box with five dozen liquor jugs',
            'how vexingly quick daft zebras jump',
        ] * 10)
    )
    return char_sampler_engine_executor_aggregator_factory.create_with_repeated_init_resource(
        [
            {'type': 'corpus', 'weight': 2, 'config': {'txt_files': [str(corpus_file)]}},
            {
                'type': 'datetime', 'weight': 1,
                'config': {
                    'datetime_formats': ['%Y-%m-%d %H:%M', '%d/%m/%Y'],
                    'timezones': ['UTC', 'Asia/Shanghai'],
                },
            },
            {'type': 'faker', 'weight': 1, 'config': {}},
            {'type': 'lexicon', 'weight': 1, 'config': {'prob_space': 0.1}},
        ],
        {'lexicon_collection': lexicon_collection},
    )


def test_char_sampler_aggregator(char_sampler_aggregator):
    rng = np.random.default_rng(0)
    for num_chars in (5, 20, 60):
        chars = char_sampler_aggregator.run(
            CharSamplerEngineRunConfig(num_chars=num_chars, enable_aggregator_mode=True),
            rng,
        )
        assert len(chars) == num_chars
        assert not chars[0].isspace() and not chars[-1].isspace()


def test_char_and_font_sampler(lexicon_collection, char_sampler_aggregator):
    executor = char_and_font_sampler_engine_executor_factory.create(
        None,
        {
            'lexicon_collection': lexicon_collection,
            'font_collection': build_font_collection(),
            'char_sampler_engine_executor_aggregator': char_sampler_aggregator,
        },
    )
    rng = np.random.default_rng(1)
    char_and_font = executor.run({'height': 32, 'width': 320}, rng)
    assert char_and_font is not None
    assert len(char_and_font.chars) > 0
    assert char_and_font.font_variant is not None


def test_barcode_engines():
    rng = np.random.default_rng(2)
    qr = barcode_qr_engine_executor_factory.create().run(
        {'height': 60, 'width': 60}, rng
    )
    assert qr.shape == (60, 60)
    assert (qr.mat > 0).mean() > 0.05

    code39 = barcode_code39_engine_executor_factory.create().run(
        {'height': 40, 'width': 160}, rng
    )
    assert code39.shape == (40, 160)
    assert (code39.mat > 0).any()


def test_char_heatmap():
    polygons = [
        Polygon.from_xy_pairs([(5, 5), (25, 5), (25, 30), (5, 30)]),
        Polygon.from_xy_pairs([(20, 5), (45, 5), (45, 30), (20, 30)]),
    ]
    aggregator = char_heatmap_engine_executor_aggregator_factory.create(
        [{'type': 'default', 'config': {}}]
    )
    heatmap = aggregator.run(
        {'height': 40, 'width': 60, 'char_polygons': polygons},
        np.random.default_rng(0),
    )
    assert heatmap.score_map.shape == (40, 60)
    # Peak inside chars, low outside.
    assert heatmap.score_map.mat[17, 15] > 0.3
    assert heatmap.score_map.mat[38, 58] < 0.1


def test_char_masks():
    polygons = [
        Polygon.from_xy_pairs([(5, 5), (25, 5), (25, 30), (5, 30)]),
    ]
    default = char_mask_default_engine_executor_factory.create().run(
        {'height': 40, 'width': 60, 'char_polygons': polygons},
        np.random.default_rng(0),
    )
    assert default.combined_chars_mask.mat.sum() > 100

    external = char_mask_external_ellipse_engine_executor_factory.create().run(
        {'height': 40, 'width': 60, 'char_polygons': polygons},
        np.random.default_rng(0),
    )
    assert external.combined_chars_mask.mat.sum() > default.combined_chars_mask.mat.sum()
    assert external.char_masks


def test_seal_impression_end_to_end():
    rng = np.random.default_rng(3)
    engine = seal_impression_ellipse_engine_executor_factory.create()
    seal = engine.run({'height': 200, 'width': 260}, rng)
    assert seal.shape == (200, 260)
    assert seal.background_mask.mat.any()
    assert seal.text_line_slots

    # Render a text line and fill the slots.
    font_variant = build_font_collection().font_metas[0].get_font_variant(0)
    slot = seal.text_line_slots[0]
    num_chars = min(len(slot.char_slots), 8)
    text_line = FontFreetypeDefaultEngine(None).run(
        FontEngineRunConfig(
            height=slot.text_line_height,
            width=slot.text_line_height * num_chars * 2,
            chars=list('SEALTEXT'[:num_chars]),
            font_variant=font_variant,
        ),
        rng,
    )
    assert text_line is not None
    score_map, char_polygons = fill_text_line_to_seal_impression(
        seal, [0], [text_line], None
    )
    assert score_map.shape == seal.shape
    assert (score_map.mat > 0).any()
    assert char_polygons
