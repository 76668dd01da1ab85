"""Error-path probes: bad configs must fail loudly and clearly."""
import numpy as np
import pytest

from vkit_tpu.pipeline import pipeline_step_collection_factory
from vkit_tpu.utility import dyn_structure


def test_unknown_step_name():
    with pytest.raises(KeyError):
        pipeline_step_collection_factory.create([
            {'name': 'text_detection.no_such_step'},
        ])


def test_forbid_extra_config_keys():
    with pytest.raises(Exception):
        pipeline_step_collection_factory.create([
            {
                'name': 'text_detection.page_shape_step',
                'config': {'area': 1000, 'not_a_field': 1},
            },
        ])


def test_distortion_rejects_bad_params():
    from vkit_tpu.element import Image
    from vkit_tpu.mechanism.distortion import (
        ComplementConfig,
        PosterizationConfig,
        complement,
        posterization,
    )

    image = Image(mat=np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(AssertionError):
        posterization.distort_image(PosterizationConfig(num_bits=9), image)
    with pytest.raises(AssertionError):
        complement.distort_image(ComplementConfig(threshold=300), image)


def test_batched_rejects_mismatched_configs():
    import jax.numpy as jnp

    from vkit_tpu.mechanism import batch_distort_images
    from vkit_tpu.mechanism.distortion import MeanShiftConfig

    images = jnp.zeros((3, 8, 8, 3), dtype=jnp.uint8)
    with pytest.raises(AssertionError):
        batch_distort_images(
            'mean_shift', [MeanShiftConfig(delta=1)] * 2, images
        )
    with pytest.raises(NotImplementedError):
        batch_distort_images(
            'no_such_distortion', [MeanShiftConfig(delta=1)] * 3, images
        )


def test_dense_warp_rejects_nonmonotone_maps():
    import jax.numpy as jnp

    from vkit_tpu.ops.warp_mxu import plan_dense_warp

    h = w = 32
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    flipped = xs[:, ::-1]  # decreasing along rows
    with pytest.raises(AssertionError):
        plan_dense_warp(ys[None], flipped[None], (h, w))
