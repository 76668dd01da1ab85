"""Char sampler shared types.

Capability parity: vkit/engine/char_sampler/type.py.
"""
from typing import List, Sequence

import attr
from numpy.random import Generator as RandomGenerator

from ...element import LexiconCollection


@attr.define
class CharSamplerEngineInitResource:
    lexicon_collection: LexiconCollection


@attr.define
class CharSamplerEngineRunConfig:
    num_chars: int
    enable_aggregator_mode: bool = False


def fill_chars_to_num(
    sample_text,
    num_chars: int,
    rng: RandomGenerator,
) -> Sequence[str]:
    """Concatenate sampled texts with single spaces to exactly ``num_chars``
    (trim keeping a non-space tail) — the shared loop of every sampler's
    non-aggregator path (e.g. vkit/engine/char_sampler/corpus.py:125-152)."""
    if num_chars <= 0:
        return []

    texts: List[str] = []
    num_chars_in_texts = 0
    while num_chars_in_texts + len(texts) - 1 < num_chars:
        text = sample_text(rng)
        texts.append(text)
        num_chars_in_texts += len(text)

    chars = list(' '.join(texts))
    if len(chars) > num_chars:
        rest = chars[num_chars:]
        chars = chars[:num_chars]
        if chars[-1].isspace():
            chars.pop()
            assert not rest[0].isspace()
            chars.append(rest[0])
    return chars
