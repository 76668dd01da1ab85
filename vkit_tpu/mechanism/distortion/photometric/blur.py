"""Blur-family photometric distortions (5).

Capability parity: vkit/mechanism/distortion/photometric/blur.py:26-330
(gaussian_blur, defocus_blur, motion_blur, glass_blur, zoom_in_blur).
Convolutions run through the device kernel library (vkit_tpu/ops/blur);
kernel construction is analytic host-side numpy.
"""
import math
from typing import Any, Mapping, Optional, Tuple

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ....element import Image
from ....ops import blur as blur_ops
from ....ops.resize_taps import Interpolation, resize_np
from ..interface import Distortion, DistortionConfig, DistortionNopState
from .opt import to_original_image, to_rgb_image


class RngStateMixin:
    """Shared rng-state freeze/replay plumbing for rng-consuming configs."""

    @property
    def supports_rng_state(self) -> bool:
        return True

    @property
    def rng_state(self) -> Optional[Mapping[str, Any]]:
        return self._rng_state  # type: ignore[attr-defined]

    @rng_state.setter
    def rng_state(self, val: Mapping[str, Any]):
        self._rng_state = val  # type: ignore[attr-defined]


def estimate_gaussian_kernel_size(sigma: float) -> int:
    kernel_size = max(3, round(3 * sigma) + 1)
    if kernel_size % 2 == 0:
        kernel_size += 1
    return kernel_size


def _anti_alias_kernel(kernel: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian anti-alias pass over a conv kernel (host-side separable)."""
    ksize = estimate_gaussian_kernel_size(sigma)
    g = blur_ops.gaussian_kernel1d(sigma, ksize).astype(np.float64)
    out = np.apply_along_axis(lambda r: np.convolve(r, g, mode='same'), 1, kernel)
    out = np.apply_along_axis(lambda c: np.convolve(c, g, mode='same'), 0, out)
    return out.astype(np.float32)


@attr.define
class GaussianBlurConfig(DistortionConfig):
    sigma: float


def gaussian_blur_image(config: GaussianBlurConfig, state, image: Image,
                        rng: Optional[RandomGenerator]) -> Image:
    mode = image.mode
    image = to_rgb_image(image, mode)
    ksize = estimate_gaussian_kernel_size(config.sigma)
    mat = blur_ops.gaussian_blur_np(image.mat, config.sigma, ksize)
    image = image.replace(mat=mat)
    return to_original_image(image, mode)


gaussian_blur = Distortion(
    config_cls=GaussianBlurConfig,
    state_cls=DistortionNopState[GaussianBlurConfig],
    func_image=gaussian_blur_image,
)


@attr.define
class DefocusBlurConfig(DistortionConfig):
    radius: int
    anti_aliasing_sigma: float = 0.5


def defocus_blur_image(config: DefocusBlurConfig, state, image: Image,
                       rng: Optional[RandomGenerator]) -> Image:
    assert config.radius > 0
    # Disk kernel padded for the anti-alias pass.
    aa_ksize = estimate_gaussian_kernel_size(config.anti_aliasing_sigma)
    pad = aa_ksize // 2 * 2
    kernel_size = 2 * config.radius + 1 + pad
    begin = -(kernel_size // 2)
    coords = np.arange(begin, begin + kernel_size)
    xs, ys = np.meshgrid(coords, coords)
    kernel = ((xs**2 + ys**2) <= config.radius**2).astype(np.float32)
    kernel /= kernel.sum()
    kernel = _anti_alias_kernel(kernel, config.anti_aliasing_sigma)

    mode = image.mode
    image = to_rgb_image(image, mode)
    mat = blur_ops.filter2d_np(image.mat, kernel)
    image = image.replace(mat=mat)
    return to_original_image(image, mode)


defocus_blur = Distortion(
    config_cls=DefocusBlurConfig,
    state_cls=DistortionNopState[DefocusBlurConfig],
    func_image=defocus_blur_image,
)


@attr.define
class MotionBlurConfig(DistortionConfig):
    radius: int
    angle: int
    anti_aliasing_sigma: float = 0.5


def motion_blur_image(config: MotionBlurConfig, state, image: Image,
                      rng: Optional[RandomGenerator]) -> Image:
    aa_ksize = estimate_gaussian_kernel_size(config.anti_aliasing_sigma)
    pad = aa_ksize // 2 * 2
    kernel_size = 2 * config.radius + 1 + pad
    # Clockwise angle in image coordinates (matches the reference's
    # 360 - angle rotation of a horizontal line, blur.py:155-167).
    kernel = blur_ops.motion_line_kernel(
        kernel_size if kernel_size % 2 else kernel_size + 1,
        -(config.angle % 360),
    )
    kernel = _anti_alias_kernel(kernel, config.anti_aliasing_sigma)
    kernel /= kernel.sum()

    mode = image.mode
    image = to_rgb_image(image, mode)
    mat = blur_ops.filter2d_np(image.mat, kernel)
    image = image.replace(mat=mat)
    return to_original_image(image, mode)


motion_blur = Distortion(
    config_cls=MotionBlurConfig,
    state_cls=DistortionNopState[MotionBlurConfig],
    func_image=motion_blur_image,
)


@attr.define
class GlassBlurConfig(RngStateMixin, DistortionConfig):
    sigma: float
    delta: int = 1
    loop: int = 5
    _rng_state: Optional[Mapping[str, Any]] = None


def build_glass_blur_permutation(
    shape: Tuple[int, int],
    delta: int,
    loop: int,
    rng: RandomGenerator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Iterated grid-strided random pixel swaps (blur.py:218-268).

    Returns (pos_y, pos_x) gather maps.
    """
    height, width = shape
    pos_x, pos_y = np.meshgrid(np.arange(width), np.arange(height))
    stride = 2 * delta + 1

    for _ in range(loop):
        offset_y = rng.integers(0, stride)
        center_y = np.arange(offset_y, height - delta, stride).reshape(-1, 1)
        offset_x = rng.integers(0, stride)
        center_x = np.arange(offset_x, width - delta, stride).reshape(1, -1)

        delta_shape = (center_y.shape[0], center_x.shape[1])
        delta_y = rng.integers(-delta, delta + 1, delta_shape)
        delta_x = rng.integers(-delta, delta + 1, delta_shape)

        deformed_y = np.clip(pos_y[center_y, center_x] + delta_y, 0, height - 1)
        deformed_x = np.clip(pos_x[center_y, center_x] + delta_x, 0, width - 1)

        pos_y[center_y, center_x], pos_y[deformed_y, deformed_x] = \
            pos_y[deformed_y, deformed_x], pos_y[center_y, center_x]
        pos_x[center_y, center_x], pos_x[deformed_y, deformed_x] = \
            pos_x[deformed_y, deformed_x], pos_x[center_y, center_x]

    return pos_y, pos_x


def glass_blur_image(config: GlassBlurConfig, state, image: Image,
                     rng: Optional[RandomGenerator]) -> Image:
    assert rng is not None
    mode = image.mode
    image = to_rgb_image(image, mode)

    ksize = estimate_gaussian_kernel_size(config.sigma)
    mat = blur_ops.gaussian_blur_np(image.mat, config.sigma, ksize)

    pos_y, pos_x = build_glass_blur_permutation(
        image.shape, config.delta, config.loop, rng
    )
    mat = mat[pos_y, pos_x]
    image = image.replace(mat=mat)
    return to_original_image(image, mode)


glass_blur = Distortion(
    config_cls=GlassBlurConfig,
    state_cls=DistortionNopState[GlassBlurConfig],
    func_image=glass_blur_image,
)


@attr.define
class ZoomInBlurConfig(DistortionConfig):
    ratio: float = 0.1
    step: float = 0.01
    alpha: float = 0.5


def zoom_in_blur_image(config: ZoomInBlurConfig, state, image: Image,
                       rng: Optional[RandomGenerator]) -> Image:
    mode = image.mode
    image = to_rgb_image(image, mode)

    acc = image.mat.astype(np.float64)
    count = 1
    for ratio in np.arange(1 + config.step, 1 + config.ratio + config.step, config.step):
        resized_height = round(image.height * ratio)
        resized_width = round(image.width * ratio)
        resized = resize_np(
            image.mat, (resized_height, resized_width), Interpolation.CUBIC
        )
        up = (resized_height - image.height) // 2
        left = (resized_width - image.width) // 2
        acc += resized[up:up + image.height, left:left + image.width]
        count += 1

    mat = (1 - config.alpha) * image.mat + config.alpha * np.round(acc / count)
    mat = np.clip(mat, 0, 255).astype(np.uint8)
    image = image.replace(mat=mat)
    return to_original_image(image, mode)


zoom_in_blur = Distortion(
    config_cls=ZoomInBlurConfig,
    state_cls=DistortionNopState[ZoomInBlurConfig],
    func_image=zoom_in_blur_image,
)
