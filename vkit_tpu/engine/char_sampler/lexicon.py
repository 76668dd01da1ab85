"""Lexicon char sampler: per-char tag-weighted draws with optional spaces.

Capability parity: vkit/engine/char_sampler/lexicon.py:25-116.
"""
from typing import List, Mapping, Optional, Sequence

import attr
from numpy.random import Generator as RandomGenerator

from ...utility import normalize_to_probs, rng_choice
from ..interface import Engine, EngineExecutorFactory
from .type import CharSamplerEngineInitResource, CharSamplerEngineRunConfig


@attr.define
class CharSamplerLexiconEngineInitConfig:
    tag_to_weight: Optional[Mapping[str, float]] = None
    prob_space: float = 0.0


CharSamplerLexiconEngineInitResource = CharSamplerEngineInitResource


class CharSamplerLexiconEngine(
    Engine[
        CharSamplerLexiconEngineInitConfig,
        CharSamplerLexiconEngineInitResource,
        CharSamplerEngineRunConfig,
        Sequence[str],
    ]
):

    KEY_SPACE = '__space'

    @classmethod
    def get_type_name(cls) -> str:
        return 'lexicon'

    def __init__(self, init_config, init_resource=None):
        super().__init__(init_config, init_resource)
        assert init_resource
        self.lexicon_collection = init_resource.lexicon_collection

        tag_weights = []
        for tag in self.lexicon_collection.tags:
            if init_config.tag_to_weight:
                if tag not in init_config.tag_to_weight:
                    raise RuntimeError(f'missing tag={tag} in tag_to_weight')
                weight = init_config.tag_to_weight[tag]
            else:
                weight = len(self.lexicon_collection.tag_to_lexicons[tag])
            tag_weights.append(weight)

        self.tags = self.lexicon_collection.tags
        self.tag_probs = normalize_to_probs(tag_weights)

        self.with_space_tags = self.tags
        self.with_space_tag_probs = self.tag_probs
        if init_config.prob_space > 0.0:
            self.with_space_tags = (*self.tags, self.KEY_SPACE)
            self.with_space_tag_probs = normalize_to_probs((
                *self.tag_probs,
                init_config.prob_space / (1 - init_config.prob_space),
            ))

    def run(self, run_config: CharSamplerEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> Sequence[str]:
        assert rng is not None

        num_chars = run_config.num_chars
        if run_config.enable_aggregator_mode:
            num_chars = int(rng.integers(1, run_config.num_chars + 1))

        chars: List[str] = []
        for char_idx in range(num_chars):
            tag = rng_choice(rng, self.with_space_tags, probs=self.with_space_tag_probs)
            if tag == self.KEY_SPACE:
                if (
                    char_idx == 0
                    or char_idx == num_chars - 1
                    or chars[char_idx - 1].isspace()
                ):
                    # No leading / trailing / consecutive spaces.
                    tag = rng_choice(rng, self.tags, probs=self.tag_probs)

            if tag == self.KEY_SPACE:
                chars.append(' ')
            else:
                lexicon = rng_choice(rng, self.lexicon_collection.tag_to_lexicons[tag])
                chars.append(rng_choice(rng, lexicon.char_and_aliases))

        return chars


char_sampler_lexicon_engine_executor_factory = EngineExecutorFactory(
    CharSamplerLexiconEngine
)
