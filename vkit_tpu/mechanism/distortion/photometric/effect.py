"""Effect-family photometric distortions (3): jpeg_quality, pixelation, fog.

Capability parity: vkit/mechanism/distortion/photometric/effect.py:26-216.
JPEG runs through the on-device codec simulation (vkit_tpu/ops/effect —
block DCT + quality-scaled quant tables) instead of a cv.imencode roundtrip;
pixelation through the MXU resize; fog through a fresh diamond-square
implementation on the numpy rng (replayable via frozen rng state).
"""
from typing import Any, Mapping, Optional, Tuple

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ....element import Image, ImageMode
from ....ops import effect as effect_ops
from ....ops.resize_taps import Interpolation, resize_np
from ..interface import Distortion, DistortionConfig, DistortionNopState
from .blur import RngStateMixin
from .opt import to_original_image, to_rgb_image


@attr.define
class JpegQualityConfig(DistortionConfig):
    quality: int


def jpeg_quality_image(config: JpegQualityConfig, state, image: Image,
                       rng: Optional[RandomGenerator]) -> Image:
    assert 0 <= config.quality <= 100
    mode = image.mode
    image = to_rgb_image(image, mode)
    mat = effect_ops.jpeg_quality_np(image.mat, config.quality)
    image = image.replace(mat=mat)
    return to_original_image(image, mode)


jpeg_quality = Distortion(
    config_cls=JpegQualityConfig,
    state_cls=DistortionNopState[JpegQualityConfig],
    func_image=jpeg_quality_image,
)


@attr.define
class PixelationConfig(DistortionConfig):
    ratio: float


def pixelation_image(config: PixelationConfig, state, image: Image,
                     rng: Optional[RandomGenerator]) -> Image:
    assert 0 < config.ratio < 1
    resized_height = round(image.height * config.ratio)
    resized_width = round(image.width * config.ratio)
    mat = resize_np(image.mat, (resized_height, resized_width), Interpolation.LINEAR)
    mat = resize_np(mat, image.shape, Interpolation.NEAREST)
    return image.replace(mat=mat)


pixelation = Distortion(
    config_cls=PixelationConfig,
    state_cls=DistortionNopState[PixelationConfig],
    func_image=pixelation_image,
)


def generate_diamond_square_mask(
    shape: Tuple[int, int],
    roughness: float,
    rng: RandomGenerator,
) -> np.ndarray:
    """Plasma fractal in [0, 1] via diamond-square midpoint displacement.

    Fresh implementation (same algorithm family as the reference's
    effect.py:89-143): start from a (2^n + 1) grid with random corners; at
    each scale, midpoints take the neighbor average lerped with fresh uniform
    noise by ``roughness**iteration``; finally crop a random window.
    """
    assert 0.0 <= roughness <= 1.0
    height, width = shape
    size = int(2**np.ceil(np.log2(max(height, width)))) + 1

    grid = np.zeros((size, size), dtype=np.float32)
    grid[0, 0], grid[0, -1], grid[-1, 0], grid[-1, -1] = rng.uniform(0, 1, 4)

    step = size - 1
    iteration = 0
    while step >= 2:
        half = step // 2
        rough = roughness**iteration

        # Diamond step: cell centers from 4 cell corners.
        corners = grid[0:size:step, 0:size:step]
        cell_avg = (
            corners[:-1, :-1] + corners[:-1, 1:] + corners[1:, :-1] + corners[1:, 1:]
        ) / 4.0
        centers = (1 - rough) * cell_avg + rough * rng.uniform(0, 1, cell_avg.shape)
        grid[half:size:step, half:size:step] = centers

        # Square step: edge midpoints from 2 corners + 2 centers (wrapped).
        m = centers.shape[0]
        wrap = np.arange(m + 1) % m
        wrap_prev = (np.arange(m + 1) - 1) % m

        # Vertical-edge midpoints: (m, m+1) at rows half::step, cols 0::step.
        two_corners = corners[:-1, :] + corners[1:, :]
        two_centers = centers[:, wrap] + centers[:, wrap_prev]
        mids_v = (1 - rough) * (two_corners + two_centers) / 4.0 \
            + rough * rng.uniform(0, 1, two_corners.shape)
        grid[half:size:step, 0:size:step] = mids_v

        # Horizontal-edge midpoints: (m+1, m) at rows 0::step, cols half::step.
        two_corners = corners[:, :-1] + corners[:, 1:]
        two_centers = centers[wrap, :] + centers[wrap_prev, :]
        mids_h = (1 - rough) * (two_corners + two_centers) / 4.0 \
            + rough * rng.uniform(0, 1, two_corners.shape)
        grid[0:size:step, half:size:step] = mids_h

        step = half
        iteration += 1

    up = rng.integers(0, size - height + 1)
    left = rng.integers(0, size - width + 1)
    return grid[up:up + height, left:left + width]


@attr.define
class FogConfig(RngStateMixin, DistortionConfig):
    roughness: float
    fog_rgb: Tuple[int, int, int] = (226, 238, 234)
    ratio_max: float = 1.0
    ratio_min: float = 0.0
    _rng_state: Optional[Mapping[str, Any]] = None


def fog_image(config: FogConfig, state, image: Image,
              rng: Optional[RandomGenerator]) -> Image:
    assert rng is not None
    mode = image.mode
    image = to_rgb_image(image, mode)

    mask = generate_diamond_square_mask(image.shape, config.roughness, rng)
    mask = mask - mask.min()
    mask = mask / max(mask.max(), 1e-6)
    assert config.ratio_min < config.ratio_max
    mask = mask * (config.ratio_max - config.ratio_min) + config.ratio_min

    mat = image.mat.astype(np.float32)
    if image.mode == ImageMode.GRAYSCALE:
        val = (
            0.2126 * config.fog_rgb[0]
            + 0.7152 * config.fog_rgb[1]
            + 0.0722 * config.fog_rgb[2]
        )
        mat = (1 - mask) * mat + mask * val
    else:
        assert image.mode == ImageMode.RGB
        fog_mat = np.full((*image.shape, 3), config.fog_rgb, dtype=np.float32)
        mat = (1 - mask[..., None]) * mat + mask[..., None] * fog_mat

    mat = np.clip(mat, 0, 255).astype(np.uint8)
    image = image.replace(mat=mat)
    return to_original_image(image, mode)


fog = Distortion(
    config_cls=FogConfig,
    state_cls=DistortionNopState[FogConfig],
    func_image=fog_image,
)
