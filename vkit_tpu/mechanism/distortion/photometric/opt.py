"""Photometric helpers.

Capability parity: vkit/mechanism/distortion/photometric/opt.py:14-120.

The mat-level helpers take an ``xp`` array namespace (numpy or jax.numpy) so
each distortion's core math is written once and runs both on the host
(per-Image API path) and on device (batched throughput path).
"""
from enum import Enum, unique
from typing import Optional, Sequence

import attr
import numpy as np

from ....element import Image, ImageMode


@unique
class OutOfBoundBehavior(Enum):
    CLIP = 'clip'
    CYCLE = 'cycle'


def extract_mat_from_image(
    image: Image,
    dtype,
    channels: Optional[Sequence[int]] = None,
) -> np.ndarray:
    mat = image.mat
    if channels:
        mat = mat[:, :, channels]
    return mat.astype(dtype)


def handle_out_of_bound_and_dtype(xp, mat, oob_behavior: OutOfBoundBehavior):
    mat = xp.round(mat)
    if oob_behavior == OutOfBoundBehavior.CLIP:
        return xp.clip(mat, 0, 255).astype(xp.uint8)
    if oob_behavior == OutOfBoundBehavior.CYCLE:
        return (mat % 256).astype(xp.uint8)
    raise NotImplementedError()


def generate_new_image(
    image: Image,
    new_mat: np.ndarray,
    channels: Optional[Sequence[int]] = None,
) -> Image:
    new_mat = np.asarray(new_mat)
    if channels:
        new_image = image.copy()
        with new_image.writable_context:
            new_image.mat[:, :, channels] = new_mat
        return new_image
    assert image.mat.shape == new_mat.shape
    return image.replace(mat=new_mat)


def to_rgb_image(image: Image, mode: ImageMode) -> Image:
    if mode not in (ImageMode.GRAYSCALE, ImageMode.RGB):
        image = image.to_rgb_image()
    return image


def to_original_image(image: Image, mode: ImageMode) -> Image:
    if mode not in (ImageMode.GRAYSCALE, ImageMode.RGB):
        image = image.to_target_mode_image(mode)
    return image
