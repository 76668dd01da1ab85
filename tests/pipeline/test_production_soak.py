"""Production-size soak: the 17-step pipeline at the reference's real page
area (2522^2, vkit/pipeline/text_detection/page_shape.py:25-57).

Skipped by default (minutes per sample on one host core); run with
VKIT_TPU_SOAK=1 python -m pytest tests/pipeline/test_production_soak.py -s
"""
import os
import time

import numpy as np
import pytest

from tests.pipeline.fixtures import build_assets, build_step_configs

pytestmark = pytest.mark.skipif(
    not os.environ.get('VKIT_TPU_SOAK'),
    reason='production-size soak; set VKIT_TPU_SOAK=1',
)


def test_production_size_pipeline(tmp_path):
    import attr

    from vkit_tpu.pipeline import (
        Pipeline,
        PipelinePostProcessor,
        PipelinePostProcessorFactory,
        pipeline_step_collection_factory,
    )

    assets = build_assets(tmp_path / 'assets')
    step_configs = build_step_configs(assets)
    step_configs[0]['config']['area'] = 2522**2

    steps = pipeline_step_collection_factory.create(step_configs)

    @attr.define
    class NopConfig:
        pass

    @attr.define
    class NopInput:
        pass

    class NopPostProcessor(PipelinePostProcessor[NopConfig, NopInput, dict]):
        def generate_output(self, input: NopInput, rng):
            return {}

    pipeline = Pipeline(
        steps=steps,
        post_processor=PipelinePostProcessorFactory(NopPostProcessor).create(),
    )

    begin = time.perf_counter()
    pipeline.run(np.random.default_rng(0))
    elapsed = time.perf_counter() - begin
    print(f'\n17-step pipeline @2522^2: {elapsed:.1f}s/sample (1 host core)')
    assert elapsed > 0


def test_production_size_synth_batch(tmp_path):
    """The batched synth path at near-production page size."""
    from vkit_tpu.synth import (
        SynthPlanner,
        SynthPlannerConfig,
        synthesize_page_batch,
    )

    assets = build_assets(tmp_path / 'assets')
    planner = SynthPlanner(SynthPlannerConfig(
        lexicon_collection_json=assets['lexicon_json'],
        font_collection_folder=assets['font_collection_folder'],
        char_sampler_configs=[{
            'type': 'corpus',
            'weight': 1,
            'config': {'txt_files': [assets['corpus_txt']]},
        }],
        page_height=2522,
        page_width=2522,
    ))
    rng = np.random.default_rng(0)

    begin = time.perf_counter()
    pages = planner.prepare_batch(2, rng)
    prep = time.perf_counter() - begin

    begin = time.perf_counter()
    result = synthesize_page_batch(pages, level=5, rng=rng)
    device = time.perf_counter() - begin
    print(f'\nsynth batch @2522^2 x2: prep {prep:.1f}s, device {device:.1f}s'
          f' ({2 / (prep + device):.3f} pages/s cold)')
    assert result.images.shape == (2, 2522, 2522, 3)
    assert result.label_stack.shape[:3] == (2, 2522, 2522)
