"""Color-family photometric distortions (10).

Capability parity: vkit/mechanism/distortion/photometric/color.py:32-439
(mean_shift, color_shift, brightness_shift, std_shift, boundary_equalization,
histogram_equalization, complement, posterization, color_balance,
channel_permutation).  Mat-level cores take an ``xp`` namespace so the
batched device path (vkit_tpu/mechanism/batched.py) reuses them with jnp.
"""
from typing import Any, Mapping, Optional, Sequence

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ....element import Image, ImageMode
from ....ops import colorspace_np as csp
from ..interface import Distortion, DistortionConfig, DistortionNopState
from .opt import (
    OutOfBoundBehavior,
    extract_mat_from_image,
    generate_new_image,
    handle_out_of_bound_and_dtype,
)

# ---------------------------------------------------------------------------
# mean_shift
# ---------------------------------------------------------------------------


def mean_shift_mat(xp, mat, delta: int, threshold: Optional[int],
                   oob_behavior: OutOfBoundBehavior):
    """mat: int16-ish array; returns uint8."""
    if threshold is None:
        mat = mat + delta
    else:
        if delta > 0:
            gate = mat <= threshold
        else:
            gate = threshold <= mat
        mat = xp.where(gate, mat + delta, mat)
    return handle_out_of_bound_and_dtype(xp, mat, oob_behavior)


def _mean_shift(
    image: Image,
    channels: Optional[Sequence[int]],
    delta: int,
    threshold: Optional[int],
    oob_behavior: OutOfBoundBehavior,
) -> Image:
    if delta == 0:
        return image
    mat = extract_mat_from_image(image, np.int16, channels)
    mat = mean_shift_mat(np, mat, delta, threshold, oob_behavior)
    return generate_new_image(image, mat, channels)


@attr.define
class MeanShiftConfig(DistortionConfig):
    delta: int
    threshold: Optional[int] = None
    channels: Optional[Sequence[int]] = None
    oob_behavior: OutOfBoundBehavior = OutOfBoundBehavior.CLIP


def mean_shift_image(config: MeanShiftConfig, state, image: Image,
                     rng: Optional[RandomGenerator]) -> Image:
    return _mean_shift(
        image=image,
        channels=config.channels,
        delta=config.delta,
        threshold=config.threshold,
        oob_behavior=config.oob_behavior,
    )


mean_shift = Distortion(
    config_cls=MeanShiftConfig,
    state_cls=DistortionNopState[MeanShiftConfig],
    func_image=mean_shift_image,
)

# ---------------------------------------------------------------------------
# color_shift — hue rotation via HSV with cyclic overflow.
# ---------------------------------------------------------------------------


@attr.define
class ColorShiftConfig(DistortionConfig):
    delta: int


def color_shift_image(config: ColorShiftConfig, state, image: Image,
                      rng: Optional[RandomGenerator]) -> Image:
    mode = image.mode
    if mode not in (ImageMode.HSV, ImageMode.HSL):
        image = image.to_hsv_image()
    image = _mean_shift(
        image=image,
        channels=[0],  # hue
        delta=config.delta,
        threshold=None,
        oob_behavior=OutOfBoundBehavior.CYCLE,
    )
    if mode not in (ImageMode.HSV, ImageMode.HSL):
        image = image.to_target_mode_image(mode)
    return image


color_shift = Distortion(
    config_cls=ColorShiftConfig,
    state_cls=DistortionNopState[ColorShiftConfig],
    func_image=color_shift_image,
)

# ---------------------------------------------------------------------------
# brightness_shift — lightness channel shift via HSL/HSV.
# ---------------------------------------------------------------------------


@attr.define
class BrightnessShiftConfig(DistortionConfig):
    delta: int
    intermediate_image_mode: ImageMode = ImageMode.HSL


def brightness_shift_image(config: BrightnessShiftConfig, state, image: Image,
                           rng: Optional[RandomGenerator]) -> Image:
    mode = image.mode
    if mode not in (ImageMode.HSV, ImageMode.HSL):
        assert config.intermediate_image_mode in (ImageMode.HSV, ImageMode.HSL)
        image = image.to_target_mode_image(config.intermediate_image_mode)
    image = _mean_shift(
        image=image,
        channels=[2],  # lightness / value
        delta=config.delta,
        threshold=None,
        oob_behavior=OutOfBoundBehavior.CLIP,
    )
    if mode not in (ImageMode.HSV, ImageMode.HSL):
        image = image.to_target_mode_image(mode)
    return image


brightness_shift = Distortion(
    config_cls=BrightnessShiftConfig,
    state_cls=DistortionNopState[BrightnessShiftConfig],
    func_image=brightness_shift_image,
)

# ---------------------------------------------------------------------------
# std_shift — contrast scale about the per-channel mean.
# ---------------------------------------------------------------------------


def std_shift_mat(xp, mat, scale: float):
    """mat: float32 (H, W[, C]); scales deviations about the channel mean."""
    assert scale > 0
    if mat.ndim == 2:
        mean = xp.mean(mat)
    else:
        mean = xp.mean(mat.reshape(-1, mat.shape[-1]), axis=0)
    mat = mat * scale - mean * (scale - 1)
    return handle_out_of_bound_and_dtype(xp, mat, OutOfBoundBehavior.CLIP)


@attr.define
class StdShiftConfig(DistortionConfig):
    scale: float
    channels: Optional[Sequence[int]] = None


def std_shift_image(config: StdShiftConfig, state, image: Image,
                    rng: Optional[RandomGenerator]) -> Image:
    mat = extract_mat_from_image(image, np.float32, config.channels)
    mat = std_shift_mat(np, mat, config.scale)
    return generate_new_image(image, mat, config.channels)


std_shift = Distortion(
    config_cls=StdShiftConfig,
    state_cls=DistortionNopState[StdShiftConfig],
    func_image=std_shift_image,
)

# ---------------------------------------------------------------------------
# boundary_equalization — per-channel min-max stretch to [0, 255].
# ---------------------------------------------------------------------------


def boundary_equalization_mat(xp, mat):
    """mat: float32; min-max stretch per channel (no-op channels kept)."""
    if mat.ndim == 2:
        lo = mat.min()
        hi = mat.max()
        delta = hi - lo
        stretched = xp.where(delta > 0, (mat - lo) * (255.0 / xp.maximum(delta, 1e-6)), mat)
    else:
        flat = mat.reshape(-1, mat.shape[-1])
        lo = flat.min(axis=0)
        hi = flat.max(axis=0)
        delta = hi - lo
        stretched = xp.where(
            delta > 0,
            (mat - lo) * (255.0 / xp.maximum(delta, 1e-6)),
            mat,
        )
    return handle_out_of_bound_and_dtype(xp, stretched, OutOfBoundBehavior.CLIP)


@attr.define
class BoundaryEqualizationConfig(DistortionConfig):
    channels: Optional[Sequence[int]] = None


def boundary_equalization_image(config: BoundaryEqualizationConfig, state,
                                image: Image, rng: Optional[RandomGenerator]) -> Image:
    mat = extract_mat_from_image(image, np.float32, config.channels)
    mat = boundary_equalization_mat(np, mat)
    return generate_new_image(image, mat, config.channels)


boundary_equalization = Distortion(
    config_cls=BoundaryEqualizationConfig,
    state_cls=DistortionNopState[BoundaryEqualizationConfig],
    func_image=boundary_equalization_image,
)

# ---------------------------------------------------------------------------
# histogram_equalization
# ---------------------------------------------------------------------------


@attr.define
class HistogramEqualizationConfig(DistortionConfig):
    channels: Optional[Sequence[int]] = None


def histogram_equalization_image(config: HistogramEqualizationConfig, state,
                                 image: Image, rng: Optional[RandomGenerator]) -> Image:
    mat = extract_mat_from_image(image, np.uint8, config.channels)
    if mat.ndim == 2:
        new_mat = csp.equalize_hist(mat)
        return image.replace(mat=new_mat)
    channels_eq = [csp.equalize_hist(mat[:, :, idx]) for idx in range(mat.shape[-1])]
    return generate_new_image(image, np.dstack(channels_eq), config.channels)


histogram_equalization = Distortion(
    config_cls=HistogramEqualizationConfig,
    state_cls=DistortionNopState[HistogramEqualizationConfig],
    func_image=histogram_equalization_image,
)

# ---------------------------------------------------------------------------
# complement — 255 - x, optionally gated by a threshold.
# ---------------------------------------------------------------------------


def complement_mat(xp, mat, threshold: Optional[int], enable_threshold_lte: bool):
    if threshold is None:
        return (255 - mat).astype(xp.uint8)
    if not enable_threshold_lte:
        gate = threshold <= mat
    else:
        gate = mat <= threshold
    return xp.where(gate, 255 - mat, mat).astype(xp.uint8)


@attr.define
class ComplementConfig(DistortionConfig):
    threshold: Optional[int] = None
    enable_threshold_lte: bool = False
    channels: Optional[Sequence[int]] = None


def complement_image(config: ComplementConfig, state, image: Image,
                     rng: Optional[RandomGenerator]) -> Image:
    if config.threshold is not None:
        assert 0 <= config.threshold <= 255
    mat = extract_mat_from_image(image, np.uint8, config.channels)
    mat = complement_mat(np, mat, config.threshold, config.enable_threshold_lte)
    return generate_new_image(image, mat, config.channels)


complement = Distortion(
    config_cls=ComplementConfig,
    state_cls=DistortionNopState[ComplementConfig],
    func_image=complement_image,
)

# ---------------------------------------------------------------------------
# posterization — clear low bits.
# ---------------------------------------------------------------------------


def posterization_mat(xp, mat, num_bits: int):
    keep = (0xFF >> num_bits) << num_bits
    return (mat & keep).astype(xp.uint8)


@attr.define
class PosterizationConfig(DistortionConfig):
    num_bits: int
    channels: Optional[Sequence[int]] = None


def posterization_image(config: PosterizationConfig, state, image: Image,
                        rng: Optional[RandomGenerator]) -> Image:
    assert 0 <= config.num_bits < 8
    if config.num_bits == 0:
        return image
    mat = extract_mat_from_image(image, np.uint8, config.channels)
    mat = posterization_mat(np, mat, config.num_bits)
    return generate_new_image(image, mat, config.channels)


posterization = Distortion(
    config_cls=PosterizationConfig,
    state_cls=DistortionNopState[PosterizationConfig],
    func_image=posterization_image,
)

# ---------------------------------------------------------------------------
# color_balance — lerp toward the grayscale version.
# ---------------------------------------------------------------------------


def color_balance_mat(xp, mat, grayscale_like_mat, ratio: float):
    out = (1 - ratio) * grayscale_like_mat + ratio * mat
    return xp.clip(out, 0, 255).astype(xp.uint8)


@attr.define
class ColorBalanceConfig(DistortionConfig):
    ratio: float


def color_balance_image(config: ColorBalanceConfig, state, image: Image,
                        rng: Optional[RandomGenerator]) -> Image:
    assert 0.0 <= config.ratio <= 1.0
    if image.mode == ImageMode.GRAYSCALE:
        return image

    grayscale_like = image.to_grayscale_image().to_target_mode_image(image.mode)
    grayscale_like_mat = grayscale_like.mat.astype(np.float32)
    mat = image.mat.astype(np.float32)

    if image.mode in (ImageMode.HSV, ImageMode.HSL):
        channels: Optional[Sequence[int]] = [1, 2]
        grayscale_like_mat = grayscale_like_mat[:, :, channels]
        mat = mat[:, :, channels]
    else:
        channels = None

    out = color_balance_mat(np, mat, grayscale_like_mat, config.ratio)
    if channels:
        return generate_new_image(image, out, channels)
    return image.replace(mat=out)


color_balance = Distortion(
    config_cls=ColorBalanceConfig,
    state_cls=DistortionNopState[ColorBalanceConfig],
    func_image=color_balance_image,
)

# ---------------------------------------------------------------------------
# channel_permutation — rng-consuming (freezes rng state for replay).
# ---------------------------------------------------------------------------


@attr.define
class ChannelPermutationConfig(DistortionConfig):
    _rng_state: Optional[Mapping[str, Any]] = None

    @property
    def supports_rng_state(self) -> bool:
        return True

    @property
    def rng_state(self) -> Optional[Mapping[str, Any]]:
        return self._rng_state

    @rng_state.setter
    def rng_state(self, val: Mapping[str, Any]):
        self._rng_state = val


def channel_permutation_image(config: ChannelPermutationConfig, state,
                              image: Image, rng: Optional[RandomGenerator]) -> Image:
    assert rng
    indices = rng.permutation(image.num_channels)
    mat = image.mat[:, :, indices]
    return image.replace(mat=mat)


channel_permutation = Distortion(
    config_cls=ChannelPermutationConfig,
    state_cls=DistortionNopState[ChannelPermutationConfig],
    func_image=channel_permutation_image,
)
