"""Full 17-step pipeline integration test (the reference's
debug_adaptive_scaling_dataset_steps equivalent, with assertions)."""
import attr
import numpy as np
import pytest

from tests.pipeline.fixtures import build_assets, build_step_configs
from vkit_tpu.pipeline import (
    Pipeline,
    PipelinePostProcessor,
    PipelinePostProcessorFactory,
    PipelineState,
    pipeline_step_collection_factory,
)


@attr.define
class DebugPostProcessorConfig:
    pass


@attr.define
class DebugPostProcessorInput:
    pass


class DebugPostProcessor(
    PipelinePostProcessor[DebugPostProcessorConfig, DebugPostProcessorInput, PipelineState]
):

    def generate_output(self, input: DebugPostProcessorInput, rng) -> PipelineState:
        return self.state  # type: ignore[attr-defined]


@pytest.fixture(scope='module')
def assets(tmp_path_factory):
    return build_assets(tmp_path_factory.mktemp('pipeline_assets'))


@pytest.fixture(scope='module')
def pipeline(assets):
    steps = pipeline_step_collection_factory.create(build_step_configs(assets))

    # Post processor that exposes the raw state for inspection.
    class StatePostProcessor(
        PipelinePostProcessor[DebugPostProcessorConfig, DebugPostProcessorInput, dict]
    ):

        def generate_output(self, input: DebugPostProcessorInput, rng):
            return {}

    post_processor = PipelinePostProcessorFactory(StatePostProcessor).create()
    return Pipeline(steps=steps, post_processor=post_processor)


def test_full_pipeline_runs(pipeline):
    rng = np.random.default_rng(2024)
    state = PipelineState()
    pipeline.run(rng, state=state)

    # Every step output landed in the state.
    keys = set(state.key_to_value)
    for expected in [
        'page_shape_step_output',
        'page_background_step_output',
        'page_layout_step_output',
        'page_image_step_output',
        'page_barcode_step_output',
        'page_seal_impresssion_step_output',
        'page_text_line_step_output',
        'page_non_text_symbol_step_output',
        'page_text_line_bounding_box_step_output',
        'page_text_line_label_step_output',
        'page_assembler_step_output',
        'page_distortion_step_output',
        'page_resizing_step_output',
        'page_cropping_step_output',
        'page_text_region_step_output',
        'page_text_region_label_step_output',
        'page_text_region_cropping_step_output',
    ]:
        assert expected in keys, expected

    # Assembled page looks sane.
    page = state.key_to_value['page_assembler_step_output'].page
    assert page.height > 0 and page.width > 0
    assert page.page_text_line_collection.text_lines

    # Distorted page keeps labels in bounds.
    distortion_out = state.key_to_value['page_distortion_step_output']
    h, w = distortion_out.page_image.shape
    for polygon in distortion_out.page_char_polygon_collection.char_polygons:
        np_points = polygon.to_np_array()
        assert (np_points[:, 0] <= w - 1).all()
        assert (np_points[:, 1] <= h - 1).all()
    assert distortion_out.page_char_mask is not None
    assert distortion_out.page_char_mask.mat.any()

    # Crops produced.
    cropping_out = state.key_to_value['page_cropping_step_output']
    for cropped_page in cropping_out.cropped_pages:
        assert cropped_page.page_image.shape == (320, 320)
        downsampled = cropped_page.downsampled_label
        assert downsampled is not None
        # Labels are core-only: core_size // downsample factor.
        assert downsampled.shape == (160, 160)
        assert downsampled.page_char_mask.shape == (128, 128)
        assert downsampled.target_core_box.shape == (128, 128)

    # Text region stacking produced char labels.
    text_region_out = state.key_to_value['page_text_region_step_output']
    assert len(text_region_out.page_char_polygons) > 0
    assert len(text_region_out.page_text_region_polygons) > 0

    label_out = state.key_to_value['page_text_region_label_step_output']
    assert label_out.page_char_mask.mat.any()
    assert label_out.page_char_gaussian_score_map.mat.max() > 0.3
    assert label_out.page_char_regression_labels
    centroid_labels = [
        label for label in label_out.page_char_regression_labels
        if label.tag.value == 'centroid'
    ]
    assert len(centroid_labels) == len(text_region_out.page_char_polygons)
