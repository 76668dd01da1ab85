"""Default char mask engine: fill char polygons into one mask.

Capability parity: vkit/engine/char_mask/default.py:31-54.
"""
from typing import Optional

import attr
from numpy.random import Generator as RandomGenerator

from ...element import Mask
from ..interface import Engine, EngineExecutorFactory, NoneTypeEngineInitResource
from .type import CharMask, CharMaskEngineRunConfig


@attr.define
class CharMaskDefaultEngineInitConfig:
    pass


class CharMaskDefaultEngine(
    Engine[
        CharMaskDefaultEngineInitConfig,
        NoneTypeEngineInitResource,
        CharMaskEngineRunConfig,
        CharMask,
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'default'

    def run(self, run_config: CharMaskEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> CharMask:
        combined_chars_mask = Mask.from_shape((run_config.height, run_config.width))
        for char_polygon in run_config.char_polygons:
            char_polygon.fill_mask(combined_chars_mask, keep_max_value=True)
        return CharMask(combined_chars_mask=combined_chars_mask)


char_mask_default_engine_executor_factory = EngineExecutorFactory(CharMaskDefaultEngine)
