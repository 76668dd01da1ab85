"""Stage-level profile of the end-to-end synthesis batch (bench config 6)
on the current backend: StepTimer wall-clock with per-stage forcing.

Usage: python tools/synth_stage_profile.py [n_batches]
       JAX_PLATFORMS=cpu python tools/synth_stage_profile.py  (CPU)
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(n_batches=3):
    from tests.pipeline.fixtures import build_assets
    from vkit_tpu.synth import (
        CropConfig,
        SynthPlanner,
        SynthPlannerConfig,
        synthesize_page_batch,
    )
    from vkit_tpu.synth.region import RegionStreamConfig
    from vkit_tpu.utility.profiling import StepTimer

    SIDE = 640
    assets = build_assets(Path('/tmp/bench_synth_assets'))
    selector = [{
        'type': 'selector', 'weight': 1,
        'config': {'image_folders': [assets['bg_image_folder']]},
    }]
    planner = SynthPlanner(SynthPlannerConfig(
        lexicon_collection_json=assets['lexicon_json'],
        font_collection_folder=assets['font_collection_folder'],
        char_sampler_configs=[{
            'type': 'corpus', 'weight': 1,
            'config': {'txt_files': [assets['corpus_txt']]},
        }],
        page_height=SIDE, page_width=SIDE,
        background_image_configs=selector,
        image_configs=selector,
        symbol_image_folders=[assets['symbol_image_folder']],
        enable_barcodes=True,
        enable_seal_impressions=True,
        enable_text_line_bounding_boxes=True,
    ))
    rng = np.random.default_rng(11)
    batch = 8
    crop = CropConfig(core_size=512, num_per_page=2)
    region = RegionStreamConfig(num_crops_per_page=2)

    timer = StepTimer()

    def one(use_timer):
        t0 = time.perf_counter()
        prep = planner.prepare_batch(batch, rng)
        prep_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        synthesize_page_batch(
            prep, 5, rng, crop_config=crop, region_config=region,
            keep_on_device=True, timer=timer if use_timer else None,
        )
        return prep_s, time.perf_counter() - t0

    # Warm: 2 untimed batches.
    for _ in range(2):
        one(False)
    timer.reset()
    preps, synths = [], []
    for _ in range(n_batches):
        p, s = one(True)
        preps.append(p)
        synths.append(s)
    print(f'prep-host s/batch: {np.mean(preps):.2f}')
    print(f'synthesize s/batch (serialized by profiling): '
          f'{np.mean(synths):.2f}')
    print(json.dumps(timer.summary(), indent=1))


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    main(n)
