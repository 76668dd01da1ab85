"""Char + font sampling engine.

Capability parity: vkit/engine/char_and_font_sampler/__init__.py:39-137.
"""
import logging
import math
from typing import Optional, Sequence

import attr
from numpy.random import Generator as RandomGenerator

from ...element import LexiconCollection
from ...utility import rng_choice
from ..char_sampler.type import CharSamplerEngineRunConfig
from ..font.type import (
    FontCollection,
    FontEngineRunConfigGlyphSequence,
    FontVariant,
)
from ..interface import (
    Engine,
    EngineExecutorAggregator,
    EngineExecutorFactory,
    NoneTypeEngineInitConfig,
)

logger = logging.getLogger(__name__)


@attr.define
class CharAndFontSamplerEngineRunConfig:
    height: int
    width: int
    glyph_sequence: FontEngineRunConfigGlyphSequence = (
        FontEngineRunConfigGlyphSequence.HORI_DEFAULT
    )
    num_chars_factor: float = 1.1
    num_chars: Optional[int] = None


@attr.define
class CharAndFontSamplerEngineInitResource:
    lexicon_collection: LexiconCollection
    font_collection: FontCollection
    char_sampler_engine_executor_aggregator: EngineExecutorAggregator


@attr.define
class CharAndFont:
    chars: Sequence[str]
    font_variant: FontVariant


class CharAndFontSamplerEngine(
    Engine[
        NoneTypeEngineInitConfig,
        CharAndFontSamplerEngineInitResource,
        CharAndFontSamplerEngineRunConfig,
        Optional[CharAndFont],
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'default'

    def __init__(self, init_config, init_resource=None):
        super().__init__(init_config, init_resource)
        assert init_resource
        self.font_collection = init_resource.font_collection
        self.lexicon_collection = init_resource.lexicon_collection
        self.char_sampler_engine_executor_aggregator = (
            init_resource.char_sampler_engine_executor_aggregator
        )

    @classmethod
    def estimate_num_chars(cls, run_config: CharAndFontSamplerEngineRunConfig) -> int:
        if run_config.num_chars:
            return run_config.num_chars
        if run_config.glyph_sequence == FontEngineRunConfigGlyphSequence.HORI_DEFAULT:
            num_chars = run_config.width / run_config.height
        elif run_config.glyph_sequence == FontEngineRunConfigGlyphSequence.VERT_DEFAULT:
            num_chars = run_config.height / run_config.width
        else:
            raise NotImplementedError()
        return math.ceil(num_chars * run_config.num_chars_factor)

    def run(self, run_config: CharAndFontSamplerEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> Optional[CharAndFont]:
        assert rng is not None

        num_chars = self.estimate_num_chars(run_config)
        chars = self.char_sampler_engine_executor_aggregator.run(
            CharSamplerEngineRunConfig(
                num_chars=num_chars,
                enable_aggregator_mode=True,
            ),
            rng,
        )
        logger.debug(f'chars={chars}')

        font_metas = self.font_collection.filter_font_metas(chars)
        if not font_metas:
            logger.warning(f'Cannot sample font_metas for chars={chars}')
            return None

        font_meta = rng_choice(rng, font_metas)
        variant_idx = int(rng.integers(0, font_meta.num_font_variants))
        font_variant = font_meta.get_font_variant(variant_idx)

        return CharAndFont(chars=chars, font_variant=font_variant)


char_and_font_sampler_engine_executor_factory = EngineExecutorFactory(
    CharAndFontSamplerEngine
)
