"""Policy sweep (mirrors the reference's per-policy level sweep strategy,
tests/mechanism/test_random_distortion.py) + RandomDistortion staging tests."""
import numpy as np
import pytest

from vkit_tpu.element import Image, Mask, Polygon
from vkit_tpu.mechanism.distortion_policy import random_distortion_factory
from vkit_tpu.mechanism.distortion_policy.geometric import affine, camera, mls
from vkit_tpu.mechanism.distortion_policy.photometric import (
    blur,
    color,
    effect,
    noise,
    streak,
)

ALL_POLICY_FACTORIES = [
    color.mean_shift_policy_factory,
    color.color_shift_policy_factory,
    color.brightness_shift_policy_factory,
    color.std_shift_policy_factory,
    color.boundary_equalization_policy_factory,
    color.histogram_equalization_policy_factory,
    color.complement_policy_factory,
    color.posterization_policy_factory,
    color.color_balance_policy_factory,
    color.channel_permutation_policy_factory,
    blur.gaussian_blur_policy_factory,
    blur.defocus_blur_policy_factory,
    blur.motion_blur_policy_factory,
    blur.glass_blur_policy_factory,
    blur.zoom_in_blur_policy_factory,
    noise.gaussion_noise_policy_factory,
    noise.poisson_noise_policy_factory,
    noise.impulse_noise_policy_factory,
    noise.speckle_noise_policy_factory,
    effect.jpeg_quality_policy_factory,
    effect.pixelation_policy_factory,
    effect.fog_policy_factory,
    streak.line_streak_policy_factory,
    streak.rectangle_streak_policy_factory,
    streak.ellipse_streak_policy_factory,
    affine.shear_hori_policy_factory,
    affine.shear_vert_policy_factory,
    affine.rotate_policy_factory,
    affine.skew_hori_policy_factory,
    affine.skew_vert_policy_factory,
    mls.similarity_mls_policy_factory,
    camera.camera_plane_only_policy_factory,
    camera.camera_cubic_curve_policy_factory,
    camera.camera_plane_line_fold_policy_factory,
    camera.camera_plane_line_curve_policy_factory,
]


@pytest.fixture(scope='module')
def image():
    rng = np.random.default_rng(0)
    small = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    return Image(mat=np.kron(small, np.ones((8, 8, 1), dtype=np.uint8)))


def test_policy_count():
    # 25 photometric + 10 geometric = 35 policies == 26 distortion modules
    # grouped (reference registers the same 35).
    assert len(ALL_POLICY_FACTORIES) == 35


@pytest.mark.parametrize(
    'factory', ALL_POLICY_FACTORIES, ids=lambda f: f.name
)
def test_policy_all_levels(factory, image):
    policy = factory.create()
    rng = np.random.default_rng(11)
    for level in (1, 5, 10):
        result = policy.distort(level=level, image=image, rng=rng)
        assert result.image is not None
        assert result.image.shape == result.shape


def test_random_distortion_end_to_end(image):
    random_distortion = random_distortion_factory.create()
    polygon = Polygon.from_xy_pairs([(10, 10), (60, 12), (58, 40), (8, 38)])
    mask = Mask.from_shapable(image)
    polygon.fill_mask(mask)

    for seed in range(5):
        rng = np.random.default_rng(seed)
        result = random_distortion.distort(
            rng=rng,
            image=image,
            mask=mask,
            polygons=[polygon],
        )
        assert result.image is not None
        assert result.image.shape == result.shape
        assert result.mask.shape == result.shape
        for poly in result.polygons:
            np_pts = poly.to_np_array()
            assert (np_pts[:, 0] < result.shape[1]).all()
            assert (np_pts[:, 1] < result.shape[0]).all()


def test_random_distortion_force_post_rotate(image):
    random_distortion = random_distortion_factory.create({'force_post_rotate': True})
    rng = np.random.default_rng(3)
    result = random_distortion.distort(rng=rng, image=image)
    assert result.image is not None


def test_random_distortion_disable_and_weights(image):
    random_distortion = random_distortion_factory.create({
        'disabled_policy_names': ['similarity_mls', 'rotate'],
        'name_to_policy_weight': {'gaussian_blur': 10.0},
        'num_photometric_min': 1,
        'num_photometric_max': 1,
    })
    rng = np.random.default_rng(4)
    result = random_distortion.distort(rng=rng, image=image)
    assert result.image is not None


def test_conflict_groups_prevent_double_blur(image):
    # With only blur-group policies and 2 required picks, conflict rejection
    # must kick in and return empty (logged), keeping the image unchanged.
    from vkit_tpu.mechanism.distortion_policy.random_distortion import (
        RandomDistortion, RandomDistortionStageConfig,
    )
    stage_config = RandomDistortionStageConfig(
        distortion_policies=[
            blur.gaussian_blur_policy_factory.create(),
            blur.defocus_blur_policy_factory.create(),
            effect.jpeg_quality_policy_factory.create(),
        ],
        distortion_policy_weights=[1.0, 1.0, 1.0],
        prob_enable=1.0,
        num_distortions_min=2,
        num_distortions_max=3,
        conflict_control_keyword_groups=[['blur', 'jpeg']],
    )
    random_distortion = RandomDistortion([stage_config], 1, 10)
    rng = np.random.default_rng(5)
    result = random_distortion.distort(rng=rng, image=image)
    assert np.array_equal(result.image.mat, image.mat)
