"""Numeric parity of device kernels against OpenCV (the reference's backend)."""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vkit_tpu.ops import blur, color, effect, noise, resize, warp  # noqa: E402
from vkit_tpu.ops.resize_taps import Interpolation  # noqa: E402


@pytest.fixture(scope='module')
def rgb():
    rng = np.random.default_rng(42)
    # Smooth-ish image: random low-res upsampled (more realistic for warps).
    small = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    return cv2.resize(small, (96, 64), interpolation=cv2.INTER_CUBIC)


def mae(a, b):
    return float(np.mean(np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64))))


class TestRemap:

    def test_identity(self, rgb):
        h, w = rgb.shape[:2]
        xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
        out = warp.remap(jnp.asarray(rgb), jnp.asarray(ys), jnp.asarray(xs))
        assert np.array_equal(np.asarray(out), rgb)

    def test_random_smooth_field_vs_cv2(self, rgb):
        h, w = rgb.shape[:2]
        rng = np.random.default_rng(0)
        xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
        # Smooth displacement.
        dy = cv2.resize(rng.uniform(-5, 5, (4, 6)).astype(np.float32), (w, h))
        dx = cv2.resize(rng.uniform(-5, 5, (4, 6)).astype(np.float32), (w, h))
        map_x = xs + dx
        map_y = ys + dy
        ref = cv2.remap(rgb, map_x, map_y, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
        mine = warp.remap(jnp.asarray(rgb), jnp.asarray(map_y), jnp.asarray(map_x))
        # cv2 uses 5-bit fixed-point interp weights; allow ~1 LSB.
        assert mae(mine, ref) < 1.0

    def test_nearest(self, rgb):
        h, w = rgb.shape[:2]
        xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
        map_x = (xs * 0.7 + 3.2).astype(np.float32)
        map_y = (ys * 0.9 + 1.1).astype(np.float32)
        ref = cv2.remap(rgb, map_x, map_y, cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT)
        mine = warp.remap(
            jnp.asarray(rgb), jnp.asarray(map_y), jnp.asarray(map_x), 'nearest'
        )
        # Rounding-rule boundary pixels may differ; nearly all must agree.
        agree = np.mean(np.asarray(mine) == ref)
        assert agree > 0.97


class TestWarpAffine:

    def test_rotation_vs_cv2(self, rgb):
        h, w = rgb.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), 17.0, 1.0)
        ref = cv2.warpAffine(rgb, mat, (w, h), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_CONSTANT)
        mine = warp.warp_affine(jnp.asarray(rgb), mat, (h, w))
        assert mae(mine, ref) < 2.0

    def test_perspective_vs_cv2(self, rgb):
        h, w = rgb.shape[:2]
        src = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float32)
        dst = np.array([[5, 3], [w - 8, 6], [w - 2, h - 4], [2, h - 9]], dtype=np.float32)
        mat = cv2.getPerspectiveTransform(src, dst)
        ref = cv2.warpPerspective(rgb, mat, (w, h), flags=cv2.INTER_LINEAR,
                                  borderMode=cv2.BORDER_CONSTANT)
        mine = warp.warp_perspective(jnp.asarray(rgb), mat, (h, w))
        assert mae(mine, ref) < 2.0

    def test_solve_perspective_matches_cv2(self):
        src = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=np.float32)
        dst = np.array([[1, 2], [11, 1], [12, 12], [0, 11]], dtype=np.float32)
        ref = cv2.getPerspectiveTransform(src, dst)
        mine = warp.solve_perspective(src, dst)
        assert np.allclose(mine / mine[2, 2], ref / ref[2, 2], atol=1e-6)

    def test_point_transform(self):
        mat = cv2.getRotationMatrix2D((10, 10), 30.0, 1.0)
        pts = np.array([[3.0, 4.0], [10.0, 10.0]])
        out = warp.affine_np_points(mat, pts)
        ref = cv2.transform(pts.reshape(-1, 1, 2), mat).reshape(-1, 2)
        assert np.allclose(out, ref, atol=1e-6)


class TestResizeDevice:

    @pytest.mark.parametrize('interp,cv_code', [
        (Interpolation.LINEAR, cv2.INTER_LINEAR),
        (Interpolation.CUBIC, cv2.INTER_CUBIC),
        (Interpolation.AREA, cv2.INTER_AREA),
        (Interpolation.LANCZOS4, cv2.INTER_LANCZOS4),
    ])
    def test_vs_cv2(self, rgb, interp, cv_code):
        ref = cv2.resize(rgb, (41, 29), interpolation=cv_code)
        mine = resize.resize(jnp.asarray(rgb), (29, 41), interp)
        assert mae(mine, ref) < 1.0, interp

    def test_batched(self, rgb):
        batch = jnp.stack([jnp.asarray(rgb)] * 3)
        out = resize.resize(batch, (32, 48), Interpolation.LINEAR)
        assert out.shape == (3, 32, 48, 3)


class TestBlur:

    def test_gaussian_vs_cv2(self, rgb):
        for sigma, ksize in [(1.0, 7), (2.5, 15)]:
            ref = cv2.GaussianBlur(rgb, (ksize, ksize), sigma)
            mine = blur.gaussian_blur(jnp.asarray(rgb), sigma, ksize)
            assert mae(mine, ref) < 1.0, sigma

    def test_filter2d_vs_cv2(self, rgb):
        kernel = np.ones((5, 5), np.float32) / 25.0
        ref = cv2.filter2D(rgb, -1, kernel)
        mine = blur.filter2d(jnp.asarray(rgb), kernel)
        assert mae(mine, ref) < 1.0

    def test_motion_kernel_is_line(self):
        k = blur.motion_line_kernel(9, 0.0)
        assert k.shape == (9, 9)
        assert k[4].sum() == pytest.approx(1.0)
        k45 = blur.motion_line_kernel(9, 45.0)
        assert abs(k45.sum() - 1.0) < 1e-6


class TestColor:

    def test_hsv_roundtrip(self, rgb):
        hsv = color.rgb_to_hsv_full(jnp.asarray(rgb))
        ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV_FULL)
        diff = np.abs(np.asarray(hsv, int) - ref.astype(int))
        diff = np.minimum(diff, 256 - diff)
        assert diff.max() <= 1

        back = color.hsv_full_to_rgb(hsv)
        assert mae(back, rgb) < 1.5

    def test_equalize_hist_vs_cv2(self, rgb):
        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        ref = cv2.equalizeHist(gray)
        mine = color.equalize_hist(jnp.asarray(gray))
        assert mae(mine, ref) <= 1.0


class TestEffects:

    def test_jpeg_quality_vs_cv2(self, rgb):
        for quality in (20, 50, 90):
            ok, enc = cv2.imencode(
                '.jpg', cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, quality],
            )
            assert ok
            ref = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
            mine = effect.jpeg_quality(jnp.asarray(rgb), quality)
            # Simulated codec vs libjpeg: close but not bit-exact.
            err = mae(mine, ref)
            ref_err = mae(ref, rgb)
            my_err = mae(mine, rgb)
            # Distortion magnitude must track the real codec's.
            assert err < 15.0, (quality, err)
            assert abs(my_err - ref_err) < max(3.0, 0.5 * ref_err), (quality, my_err, ref_err)

    def test_pixelation(self, rgb):
        out = effect.pixelation(jnp.asarray(rgb), (16, 24))
        assert out.shape == rgb.shape
        # Blocky: neighboring pixels within a block identical.
        out = np.asarray(out)
        assert np.array_equal(out[0, 0], out[1, 1])

    def test_diamond_square(self):
        key = jax.random.PRNGKey(0)
        m = effect.diamond_square_mask(key, 64)
        m = np.asarray(m)
        assert m.shape == (64, 64)
        assert 0.0 <= m.min() and m.max() <= 1.0
        assert m.std() > 0.05


class TestNoise:

    def test_gaussian_noise_stats(self, rgb):
        key = jax.random.PRNGKey(1)
        out = noise.gaussian_noise(key, jnp.asarray(rgb), std=10.0)
        diff = np.asarray(out, dtype=float) - rgb.astype(float)
        assert 5.0 < diff.std() < 15.0

    def test_impulse_noise_fraction(self, rgb):
        key = jax.random.PRNGKey(2)
        out = noise.impulse_noise(key, jnp.asarray(rgb), 0.05, 0.05)
        out = np.asarray(out)
        frac_salt = np.mean(np.all(out == 255, axis=-1))
        frac_pepper = np.mean(np.all(out == 0, axis=-1))
        assert 0.02 < frac_salt < 0.09
        assert 0.02 < frac_pepper < 0.09


def test_jpeg_roundtrip_bit_exact_vs_libjpeg():
    """ops/jpeg_exact.py must reproduce cv2's (libjpeg) roundtrip bit for
    bit across sizes and qualities — including non-MCU-aligned shapes."""
    import cv2

    from vkit_tpu.ops.jpeg_exact import jpeg_roundtrip_exact

    rng = np.random.default_rng(7)
    cases = [(64, 64, 95), (120, 168, 60), (89, 92, 56), (48, 40, 84),
             (33, 57, 10), (160, 200, 30)]
    for h, w, q in cases:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        enc = cv2.imencode('.jpg', img, [cv2.IMWRITE_JPEG_QUALITY, q])[1]
        ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)
        got = jpeg_roundtrip_exact(img[..., ::-1], q)[..., ::-1]
        assert np.array_equal(ref, got), (h, w, q)
    gray = rng.integers(0, 256, (70, 90), dtype=np.uint8)
    enc = cv2.imencode('.jpg', gray, [cv2.IMWRITE_JPEG_QUALITY, 40])[1]
    ref = cv2.imdecode(enc, cv2.IMREAD_GRAYSCALE)
    assert np.array_equal(ref, jpeg_roundtrip_exact(gray, 40))


def test_jpeg_roundtrip_jnp_arbitrary_shapes():
    """The device twin must match the numpy path on NON-16-multiple shapes
    (arbitrary page/canvas sizes reach the batched jpeg draw)."""
    from vkit_tpu.ops.effect import (
        _CHROMA_QTABLE, _LUMA_QTABLE, _quality_scaled_table,
    )
    from vkit_tpu.ops.jpeg_exact import (
        jpeg_roundtrip_exact, jpeg_roundtrip_exact_jnp,
    )

    rng = np.random.default_rng(11)
    for h, w, q in [(64, 64, 60), (89, 92, 56), (33, 57, 30), (70, 91, 85)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        luma = jnp.asarray(
            _quality_scaled_table(_LUMA_QTABLE, q).astype(np.int32))
        chroma = jnp.asarray(
            _quality_scaled_table(_CHROMA_QTABLE, q).astype(np.int32))
        got = np.asarray(
            jax.jit(jpeg_roundtrip_exact_jnp)(jnp.asarray(img), luma, chroma))
        ref = jpeg_roundtrip_exact(img, q)
        assert np.array_equal(ref, got), (h, w, q)
