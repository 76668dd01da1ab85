"""Datetime char sampler: strftime with random tz/format/delimiter swap.

Capability parity: vkit/engine/char_sampler/datetime.py:28-127.  ``pytz`` is
replaced by the stdlib ``zoneinfo``.
"""
import time
from datetime import date, datetime
from typing import List, Optional, Sequence, Tuple
from zoneinfo import ZoneInfo

import attr
from numpy.random import Generator as RandomGenerator

from ...utility import rng_choice
from ..interface import Engine, EngineExecutorFactory
from .type import (
    CharSamplerEngineInitResource,
    CharSamplerEngineRunConfig,
    fill_chars_to_num,
)


@attr.define
class CharSamplerDatetimeEngineInitConfig:
    datetime_formats: Sequence[str]
    timezones: Sequence[str]
    datetime_begin: Tuple[int, int, int] = (1991, 12, 25)
    datetime_end: Tuple[int, int, int] = (2050, 12, 31)


CharSamplerDatetimeEngineInitResource = CharSamplerEngineInitResource


class CharSamplerDatetimeEngine(
    Engine[
        CharSamplerDatetimeEngineInitConfig,
        CharSamplerDatetimeEngineInitResource,
        CharSamplerEngineRunConfig,
        Sequence[str],
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'datetime'

    def __init__(self, init_config, init_resource=None):
        super().__init__(init_config, init_resource)
        assert init_resource
        self.lexicon_collection = init_resource.lexicon_collection
        self.delimiters = [
            char for char in ['/', ':', '-', ',', '.', '*']
            if self.lexicon_collection.has_char(char)
        ]
        self.ticks_begin = int(time.mktime(date(*init_config.datetime_begin).timetuple()))
        self.ticks_end = int(time.mktime(date(*init_config.datetime_end).timetuple()))

    def sample_datetime_text(self, rng: RandomGenerator) -> str:
        ticks = int(rng.integers(self.ticks_begin, self.ticks_end + 1))
        dt = datetime.fromtimestamp(ticks)
        tz = ZoneInfo(rng_choice(rng, self.init_config.timezones))
        dt = dt.replace(tzinfo=tz)

        datetime_format = rng_choice(rng, self.init_config.datetime_formats)
        delimiters = [d for d in self.delimiters if d in datetime_format]
        if delimiters:
            selected = rng_choice(rng, delimiters)
            others = [d for d in self.delimiters if d != selected]
            others.append(' ')
            datetime_format = datetime_format.replace(selected, rng_choice(rng, others))

        text = dt.strftime(datetime_format)
        return ''.join(
            char for char in text
            if char.isspace() or self.lexicon_collection.has_char(char)
        ).strip()

    def run(self, run_config: CharSamplerEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> Sequence[str]:
        assert rng is not None
        if run_config.enable_aggregator_mode:
            return self.sample_datetime_text(rng)
        return fill_chars_to_num(self.sample_datetime_text, run_config.num_chars, rng)


char_sampler_datetime_engine_executor_factory = EngineExecutorFactory(
    CharSamplerDatetimeEngine
)
