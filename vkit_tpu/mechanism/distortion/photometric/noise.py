"""Noise-family photometric distortions (4).

Capability parity: vkit/mechanism/distortion/photometric/noise.py:25-190.
The (deliberately misspelled) ``gaussion_noise`` name is kept for config
compatibility.  Host path uses the numpy rng for bit-replayable sampling; the
batched device path uses vkit_tpu/ops/noise with jax PRNG keys.
"""
from typing import Any, Mapping, Optional

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ....element import Image
from ..interface import Distortion, DistortionConfig, DistortionNopState
from .blur import RngStateMixin
from .opt import extract_mat_from_image


def _clip_u8(mat: np.ndarray) -> np.ndarray:
    return np.clip(mat, 0, 255).astype(np.uint8)


@attr.define
class GaussionNoiseConfig(RngStateMixin, DistortionConfig):
    std: float
    _rng_state: Optional[Mapping[str, Any]] = None


def gaussion_noise_image(config: GaussionNoiseConfig, state, image: Image,
                         rng: Optional[RandomGenerator]) -> Image:
    assert rng
    mat = extract_mat_from_image(image, np.int16)
    noise = np.round(rng.normal(0, config.std, mat.shape)).astype(np.int16)
    return Image(mat=_clip_u8(mat + noise))


gaussion_noise = Distortion(
    config_cls=GaussionNoiseConfig,
    state_cls=DistortionNopState[GaussionNoiseConfig],
    func_image=gaussion_noise_image,
)


@attr.define
class PoissonNoiseConfig(RngStateMixin, DistortionConfig):
    _rng_state: Optional[Mapping[str, Any]] = None


def poisson_noise_image(config: PoissonNoiseConfig, state, image: Image,
                        rng: Optional[RandomGenerator]) -> Image:
    assert rng
    mat = rng.poisson(extract_mat_from_image(image, np.float32))
    return Image(mat=_clip_u8(mat))


poisson_noise = Distortion(
    config_cls=PoissonNoiseConfig,
    state_cls=DistortionNopState[PoissonNoiseConfig],
    func_image=poisson_noise_image,
)


@attr.define
class ImpulseNoiseConfig(RngStateMixin, DistortionConfig):
    prob_salt: float
    prob_pepper: float
    _rng_state: Optional[Mapping[str, Any]] = None


def impulse_noise_image(config: ImpulseNoiseConfig, state, image: Image,
                        rng: Optional[RandomGenerator]) -> Image:
    assert rng
    prob_presv = 1 - config.prob_salt - config.prob_pepper
    assert prob_presv >= 0.0

    selector = rng.choice(
        (0, 1, 2),
        size=image.shape,
        p=[prob_presv, config.prob_salt, config.prob_pepper],
    )
    mat = image.mat.copy()
    mat[selector == 1] = 255
    mat[selector == 2] = 0
    return Image(mat=mat)


impulse_noise = Distortion(
    config_cls=ImpulseNoiseConfig,
    state_cls=DistortionNopState[ImpulseNoiseConfig],
    func_image=impulse_noise_image,
)


@attr.define
class SpeckleNoiseConfig(RngStateMixin, DistortionConfig):
    std: float
    _rng_state: Optional[Mapping[str, Any]] = None


def speckle_noise_image(config: SpeckleNoiseConfig, state, image: Image,
                        rng: Optional[RandomGenerator]) -> Image:
    assert rng
    mat = extract_mat_from_image(image, np.float32)
    noise = rng.normal(0, config.std, mat.shape)
    return Image(mat=_clip_u8(mat + mat * noise))


speckle_noise = Distortion(
    config_cls=SpeckleNoiseConfig,
    state_cls=DistortionNopState[SpeckleNoiseConfig],
    func_image=speckle_noise_image,
)
