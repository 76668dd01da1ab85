from ..interface import EngineExecutorAggregatorFactory
from .corpus import (
    CharSamplerCorpusEngine,
    CharSamplerCorpusEngineInitConfig,
    char_sampler_corpus_engine_executor_factory,
)
from .datetime import (
    CharSamplerDatetimeEngine,
    CharSamplerDatetimeEngineInitConfig,
    char_sampler_datetime_engine_executor_factory,
)
from .faker import (
    CharSamplerFakerEngine,
    CharSamplerFakerEngineInitConfig,
    char_sampler_faker_engine_executor_factory,
)
from .func_collate import char_sampler_func_collate
from .lexicon import (
    CharSamplerLexiconEngine,
    CharSamplerLexiconEngineInitConfig,
    char_sampler_lexicon_engine_executor_factory,
)
from .type import CharSamplerEngineInitResource, CharSamplerEngineRunConfig

char_sampler_engine_executor_aggregator_factory = EngineExecutorAggregatorFactory(
    [
        char_sampler_corpus_engine_executor_factory,
        char_sampler_datetime_engine_executor_factory,
        char_sampler_faker_engine_executor_factory,
        char_sampler_lexicon_engine_executor_factory,
    ],
    func_collate=char_sampler_func_collate,
)
