import numpy as np

from vkit_tpu.element import Box, Image, Line, Mask, Point, Polygon, ScoreMap
from vkit_tpu.mechanism.cropper import Cropper
from vkit_tpu.mechanism.painter import Painter


def test_cropper_random_proposal():
    rng = np.random.default_rng(0)
    for _ in range(10):
        cropper = Cropper.create_from_random_proposal(
            shape=(100, 120), core_size=40, pad_size=10, rng=rng
        )
        assert cropper.crop_size == 60
        image = Image.from_shape((100, 120), value=128)
        cropped = cropper.crop_image(image)
        assert cropped.shape == (60, 60)

        mask = Mask.from_shape((100, 120), value=1)
        cropped_mask = cropper.crop_mask(mask, core_only=True)
        assert cropped_mask.shape == (40, 40)
        assert cropped_mask.box == cropper.target_core_box


def test_cropper_small_source_pads():
    rng = np.random.default_rng(1)
    cropper = Cropper.create_from_random_proposal(
        shape=(30, 30), core_size=40, pad_size=5, rng=rng, pad_value=7
    )
    image = Image.from_shape((30, 30), value=200)
    cropped = cropper.crop_image(image)
    assert cropped.shape == (50, 50)
    # Padding present.
    assert (cropped.mat == 7).any()
    assert (cropped.mat == 200).any()


def test_cropper_center_point():
    cropper = Cropper.create_from_center_point(
        shape=(100, 100), core_size=30, pad_size=5,
        center_point=Point.create(y=50, x=50),
    )
    sm = ScoreMap.from_shape((100, 100), value=0.5)
    cropped = cropper.crop_score_map(sm)
    assert cropped.shape == (40, 40)


def test_painter_smoke(tmp_path):
    rng = np.random.default_rng(0)
    image = Image(mat=rng.integers(0, 256, (60, 80, 3), dtype=np.uint8))
    polygon = Polygon.from_xy_pairs([(10, 10), (50, 12), (48, 40), (8, 38)])
    mask = Mask.from_shapable(image)
    polygon.fill_mask(mask)
    sm = ScoreMap.from_shapable(image, value=0.3)

    painter = Painter.create(image)
    painter.paint_points([Point.create(y=5, x=5)], color='red')
    painter.paint_lines([Line.from_flatten_xy_pairs([0, 0, 79, 59])])
    painter.paint_boxes([Box(up=2, down=20, left=2, right=30)])
    painter.paint_polygons([polygon], enable_index=True)
    painter.paint_mask(mask)
    painter.paint_masks([mask])
    painter.paint_score_map(sm)
    painter.paint_texts(['hello'], [Point.create(y=3, x=40)])
    out = tmp_path / 'painted.png'
    painter.to_file(str(out))
    assert out.exists()
    # Something was painted.
    assert not np.array_equal(painter.image.mat, image.mat)


def test_visualize_image_grid():
    from vkit_tpu.mechanism.distortion.warp_plan import (
        uniform_lattice,
        visualize_lattice,
    )

    lattice = uniform_lattice(height=64, width=96, grid_size=16)
    image = visualize_lattice(lattice)
    assert image.shape == (64, 96)
    # Grid lines drawn: not a blank canvas.
    assert (image.mat < 128).any()
    assert (image.mat > 128).any()
