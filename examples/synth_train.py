"""Flagship flow: the tensor-first synth pipeline feeding training.

Run (CPU, 8 virtual devices):
    JAX_PLATFORMS=cpu python examples/synth_train.py

One loop, three overlapping stages:
1. Host prep (background thread via synthesize_stream): layout sampling,
   char/font sampling, atlas text-line layout, pre-warp label rasters.
2. Device synthesis: glyph compositing + randomized photometric rounds +
   one dense warp of image AND labels + Jacobian height correction.
3. Training: the conv-FPN detector consumes the batch through the
   device-side label bridge (models/data.py), sharded over a dp mesh.
"""
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tests'))

import jax

try:
    jax.config.update('jax_num_cpu_devices', 8)
except RuntimeError:
    pass

import jax.numpy as jnp
import numpy as np

from tests.pipeline.fixtures import build_assets
from vkit_tpu.models import (
    create_model,
    create_optimizer,
    evaluate,
    init_train_state,
    make_train_step,
    synth_to_train_batch,
)
from vkit_tpu.synth import (
    CropConfig,
    SynthPlanner,
    SynthPlannerConfig,
    synthesize_stream,
)


def main():
    with tempfile.TemporaryDirectory() as tmp:
        assets = build_assets(Path(tmp) / 'assets')
        planner = SynthPlanner(SynthPlannerConfig(
            lexicon_collection_json=assets['lexicon_json'],
            font_collection_folder=assets['font_collection_folder'],
            char_sampler_configs=[{
                'type': 'corpus', 'weight': 1,
                'config': {'txt_files': [assets['corpus_txt']]},
            }],
            page_height=256, page_width=256,
            # Full page content (every assembler layer).
            background_image_configs=[{
                'type': 'selector', 'weight': 1,
                'config': {'image_folders': [assets['bg_image_folder']]},
            }],
            symbol_image_folders=[assets['symbol_image_folder']],
            enable_barcodes=True,
            enable_seal_impressions=True,
            enable_text_line_bounding_boxes=True,
        ))

        model = create_model(stage_features=(32, 64), fpn_features=32)
        optimizer = create_optimizer(1e-3)
        state = None
        train_step = jax.jit(make_train_step(model, optimizer))

        rng = np.random.default_rng(0)
        batches = []
        for step_idx, result in enumerate(synthesize_stream(
            planner, batch_size=4, level=4, rng=rng, num_batches=4,
            crop_config=CropConfig(core_size=192, num_per_page=1),
            emit_char_gaussians=True,
        )):
            batch = synth_to_train_batch(
                jnp.asarray(result.images),
                jnp.asarray(result.label_stack),
                jnp.asarray(result.active_masks),
                char_gaussians=jnp.asarray(result.char_gaussian_maps),
            )
            if result.crop_images is not None:
                print(f'  crops: {result.crop_images.shape[0]} '
                      f'{result.crop_images.shape[1:]}')
            if state is None:
                state = init_train_state(
                    model, optimizer, np.asarray(batch.images)
                )
            state, metrics = train_step(state, batch)
            batches.append(batch)
            print(f'step {step_idx}: loss={float(metrics["loss"]):.4f} '
                  f'mask={float(metrics["mask_loss"]):.4f} '
                  f'height={float(metrics["height_loss"]):.4f}')

        scores = evaluate(model, state.params, batches)
        print('eval:', {k: round(v, 4) for k, v in scores.items()})


if __name__ == '__main__':
    main()
