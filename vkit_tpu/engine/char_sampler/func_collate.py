"""Aggregator-mode collate: concatenate multi-engine samples to num_chars.

Capability parity: vkit/engine/char_sampler/func_collate.py:22-55.
"""
from typing import List, Sequence

from numpy.random import Generator as RandomGenerator

from ..interface import EngineExecutorAggregatorSelector
from .type import CharSamplerEngineRunConfig


def char_sampler_func_collate(
    selector: EngineExecutorAggregatorSelector,
    run_config: CharSamplerEngineRunConfig,
    rng: RandomGenerator,
) -> Sequence[str]:
    if not run_config.enable_aggregator_mode:
        return selector.select_engine_executor(rng).run(run_config, rng)

    num_chars = run_config.num_chars
    chars: List[str] = []
    while len(chars) < num_chars:
        if chars and rng.random() < 0.5:
            chars.append(' ')
        new_chars = selector.select_engine_executor(rng).run(run_config, rng)
        chars.extend(new_chars)

    if len(chars) > num_chars:
        rest = chars[num_chars:]
        chars = chars[:num_chars]
        if chars[-1].isspace():
            chars.pop()
            assert not rest[0].isspace()
            chars.append(rest[0])

    assert len(chars) == num_chars
    return chars
