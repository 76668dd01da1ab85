"""Blend src raster into dst grid space — the device warp call site.

Capability parity: vkit/mechanism/distortion/geometric/grid_rendering/
grid_blender.py:54-81 (cv.remap INTER_LINEAR replaced by the jnp/Pallas warp
kernel, vkit_tpu/ops/warp).
"""
import numpy as np

from .....element import Image, ImageMode, Mask, ScoreMap
from .....ops import warp as warp_ops
from .type import ImageGrid


def _remap_mat(mat: np.ndarray, src_image_grid: ImageGrid, dst_image_grid: ImageGrid):
    map_y, map_x = src_image_grid.generate_remap_params(dst_image_grid)
    return warp_ops.remap_np(mat, np.asarray(map_y), np.asarray(map_x), 'bilinear')


def create_image_from_image_grid(image_grid: ImageGrid, image_mode: ImageMode) -> Image:
    ndim = image_mode.to_ndim()
    if ndim == 2:
        shape = (image_grid.image_height, image_grid.image_width)
    else:
        num_channels = image_mode.to_num_channels()
        assert num_channels
        shape = (image_grid.image_height, image_grid.image_width, num_channels)
    return Image(mat=np.zeros(shape, dtype=image_mode.to_dtype()), mode=image_mode)


def create_score_map_from_image_grid(image_grid: ImageGrid) -> ScoreMap:
    shape = (image_grid.image_height, image_grid.image_width)
    return ScoreMap(mat=np.zeros(shape, dtype=np.float32))


def create_mask_from_image_grid(image_grid: ImageGrid) -> Mask:
    shape = (image_grid.image_height, image_grid.image_width)
    return Mask(mat=np.zeros(shape, dtype=np.uint8))


def blend_src_to_dst_image(
    src_image: Image,
    src_image_grid: ImageGrid,
    dst_image_grid: ImageGrid,
) -> Image:
    mat = _remap_mat(src_image.mat, src_image_grid, dst_image_grid)
    return Image(mat=mat, mode=src_image.mode)


def blend_src_to_dst_score_map(
    src_score_map: ScoreMap,
    src_image_grid: ImageGrid,
    dst_image_grid: ImageGrid,
) -> ScoreMap:
    mat = _remap_mat(src_score_map.mat, src_image_grid, dst_image_grid)
    return ScoreMap(mat=np.clip(mat, 0.0, 1.0) if src_score_map.is_prob else mat,
                    is_prob=src_score_map.is_prob)


def blend_src_to_dst_mask(
    src_mask: Mask,
    src_image_grid: ImageGrid,
    dst_image_grid: ImageGrid,
) -> Mask:
    mat = _remap_mat(src_mask.mat, src_image_grid, dst_image_grid)
    return Mask(mat=mat)
