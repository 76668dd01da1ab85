import numpy as np
import pytest

from vkit_tpu.element import Image, ImageMode
from vkit_tpu.mechanism.distortion import photometric as pm


@pytest.fixture(scope='module')
def image():
    rng = np.random.default_rng(0)
    return Image(mat=rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))


def rngen(seed=7):
    return np.random.default_rng(seed)


def test_mean_shift(image):
    out = pm.mean_shift.distort_image({'delta': 30}, image)
    expected = np.clip(image.mat.astype(int) + 30, 0, 255)
    assert np.array_equal(out.mat, expected)
    # Thresholded: only pixels <= 100 shift.
    out2 = pm.mean_shift.distort_image({'delta': 30, 'threshold': 100}, image)
    mask = image.mat <= 100
    assert np.array_equal(out2.mat[mask], np.clip(image.mat[mask].astype(int) + 30, 0, 255))
    assert np.array_equal(out2.mat[~mask], image.mat[~mask])


def test_color_shift_preserves_mode(image):
    out = pm.color_shift.distort_image({'delta': 60}, image)
    assert out.mode is ImageMode.RGB
    assert out.shape == image.shape
    assert not np.array_equal(out.mat, image.mat)


def test_brightness_shift(image):
    out = pm.brightness_shift.distort_image({'delta': 50}, image)
    assert out.mat.astype(int).mean() > image.mat.astype(int).mean()
    out_dark = pm.brightness_shift.distort_image({'delta': -50}, image)
    assert out_dark.mat.astype(int).mean() < image.mat.astype(int).mean()


def test_std_shift(image):
    out = pm.std_shift.distort_image({'scale': 2.0}, image)
    assert out.mat.astype(float).std() > image.mat.astype(float).std()


def test_boundary_equalization():
    mat = np.random.default_rng(1).integers(100, 156, (32, 32, 3), dtype=np.uint8)
    out = pm.boundary_equalization.distort_image({}, Image(mat=mat))
    assert out.mat.min() <= 2 and out.mat.max() >= 253


def test_histogram_equalization(image):
    out = pm.histogram_equalization.distort_image({}, image)
    assert out.shape == image.shape


def test_complement(image):
    out = pm.complement.distort_image({}, image)
    assert np.array_equal(out.mat, 255 - image.mat)


def test_posterization(image):
    out = pm.posterization.distort_image({'num_bits': 4}, image)
    assert np.array_equal(out.mat, image.mat & 0xF0)


def test_color_balance(image):
    out = pm.color_balance.distort_image({'ratio': 0.0}, image)
    # ratio 0 -> fully grayscale: channels equal.
    assert np.array_equal(out.mat[..., 0], out.mat[..., 1])


def test_channel_permutation_replay(image):
    rng = rngen()
    result = pm.channel_permutation.distort(
        {}, image=image, rng=rng, get_config=True
    )
    # Replaying with the frozen rng state reproduces the same permutation.
    replay = pm.channel_permutation.distort_image(result.config, image)
    assert np.array_equal(result.image.mat, replay.mat)


def test_gaussian_blur(image):
    out = pm.gaussian_blur.distort_image({'sigma': 2.0}, image)
    assert out.mat.astype(float).std() < image.mat.astype(float).std()


def test_defocus_and_motion_blur(image):
    out = pm.defocus_blur.distort_image({'radius': 3}, image)
    assert out.shape == image.shape
    out = pm.motion_blur.distort_image({'radius': 4, 'angle': 30}, image)
    assert out.shape == image.shape


def test_glass_blur_replay(image):
    rng = rngen()
    result = pm.glass_blur.distort(
        {'sigma': 1.0}, image=image, rng=rng, get_config=True
    )
    replay = pm.glass_blur.distort_image(result.config, image)
    assert np.array_equal(result.image.mat, replay.mat)


def test_zoom_in_blur(image):
    out = pm.zoom_in_blur.distort_image({}, image)
    assert out.shape == image.shape


def test_noises_replay(image):
    for distortion, config in [
        (pm.gaussion_noise, {'std': 10.0}),
        (pm.poisson_noise, {}),
        (pm.impulse_noise, {'prob_salt': 0.05, 'prob_pepper': 0.05}),
        (pm.speckle_noise, {'std': 0.1}),
    ]:
        rng = rngen()
        result = distortion.distort(config, image=image, rng=rng, get_config=True)
        replay = distortion.distort_image(result.config, image)
        assert np.array_equal(result.image.mat, replay.mat), distortion


def test_jpeg_quality(image):
    out = pm.jpeg_quality.distort_image({'quality': 10}, image)
    err = np.abs(out.mat.astype(float) - image.mat.astype(float)).mean()
    assert 1.0 < err < 90.0  # q10 on a pure-noise image is very lossy


def test_pixelation(image):
    out = pm.pixelation.distort_image({'ratio': 0.25}, image)
    assert out.shape == image.shape


def test_fog_replay(image):
    rng = rngen()
    result = pm.fog.distort(
        {'roughness': 0.5}, image=image, rng=rng, get_config=True
    )
    replay = pm.fog.distort_image(result.config, image)
    assert np.array_equal(result.image.mat, replay.mat)


def test_line_streak(image):
    out = pm.line_streak.distort_image({'thickness': 1, 'gap': 4}, image)
    # Streak rows/cols are black.
    assert out.mat[0].sum() == 0
    assert out.mat[:, 0].sum() == 0


def test_rectangle_streak(image):
    out = pm.rectangle_streak.distort_image({'short_side_min': 8}, image)
    assert not np.array_equal(out.mat, image.mat)


def test_ellipse_streak(image):
    out = pm.ellipse_streak.distort_image({'short_side_min': 8}, image)
    assert not np.array_equal(out.mat, image.mat)


def test_distortion_names():
    assert pm.mean_shift.config_cls.get_name() == 'mean_shift'
    assert pm.gaussion_noise.config_cls.get_name() == 'gaussion_noise'
    assert pm.jpeg_quality.config_cls.get_name() == 'jpeg_quality'
    assert not pm.mean_shift.is_geometric
