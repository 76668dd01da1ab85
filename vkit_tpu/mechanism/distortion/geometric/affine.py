"""Affine / perspective geometric distortions (5): shear_hori, shear_vert,
rotate, skew_hori, skew_vert.

Capability parity: vkit/mechanism/distortion/geometric/affine.py:92-533.
Each state derives a forward transform matrix + destination canvas size; the
raster path runs through the device warp kernel (vkit_tpu/ops/warp, which
inverts the matrix and samples backward), points/polygons transform by the
forward matrix on host.
"""
import math
from typing import Iterable, List, Optional, Sequence, Tuple, Type, TypeVar, Union

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ....element import (
    Image,
    Mask,
    Point,
    PointList,
    PointTuple,
    Polygon,
    ScoreMap,
)
from ....ops import warp as warp_ops
from ..interface import Distortion, DistortionConfig, DistortionState


def affine_mat(trans_mat: np.ndarray, dsize: Tuple[int, int], mat: np.ndarray) -> np.ndarray:
    """Warp a raster by a forward 2x3/3x3 matrix into a (w, h) dsize canvas."""
    dst_shape = (dsize[1], dsize[0])
    return warp_ops.warp_affine_np(mat, trans_mat, dst_shape)


def affine_np_points(trans_mat: np.ndarray, np_points: np.ndarray) -> np.ndarray:
    return warp_ops.affine_np_points(trans_mat, np_points)


def affine_points(trans_mat: np.ndarray, points: PointTuple) -> PointTuple:
    new_np_points = affine_np_points(trans_mat, points.to_smooth_np_array())
    return PointTuple.from_xy_pairs(
        (float(x), float(y)) for x, y in new_np_points
    )


def affine_polygons(trans_mat: np.ndarray, polygons: Sequence[Polygon]) -> Sequence[Polygon]:
    points_ranges: List[Tuple[int, int]] = []
    points = PointList()
    for polygon in polygons:
        points_ranges.append((len(points), len(points) + polygon.num_points))
        points.extend(polygon.points)

    new_np_points = affine_np_points(trans_mat, points.to_smooth_np_array())
    return [
        Polygon.from_xy_pairs(
            (float(x), float(y)) for x, y in new_np_points[begin:end]
        )
        for begin, end in points_ranges
    ]


def convert_dsize_to_result_shape(dsize: Optional[Tuple[int, int]]):
    if dsize:
        return dsize[1], dsize[0]


@attr.define
class ShearHoriConfig(DistortionConfig):
    # (-90, 90), positive shears rightward.
    angle: int

    @property
    def is_nop(self):
        return self.angle == 0


class ShearHoriState(DistortionState[ShearHoriConfig]):

    def __init__(self, config: ShearHoriConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        tan_phi = math.tan(math.radians(config.angle))
        height, width = shape
        shift_x = abs(height * tan_phi)
        self.dsize = (math.ceil(width + shift_x), height)

        if config.angle < 0:
            self.trans_mat = np.asarray(
                [(1, -tan_phi, 0), (0, 1, 0)], dtype=np.float32
            )
        elif config.angle > 0:
            self.trans_mat = np.asarray(
                [(1, -tan_phi, shift_x), (0, 1, 0)], dtype=np.float32
            )
        else:
            self.trans_mat = None
            self.dsize = None

    @property
    def result_shape(self):
        return convert_dsize_to_result_shape(self.dsize)


@attr.define
class ShearVertConfig(DistortionConfig):
    # (-90, 90), positive shears downward.
    angle: int

    @property
    def is_nop(self):
        return self.angle == 0


class ShearVertState(DistortionState[ShearVertConfig]):

    def __init__(self, config: ShearVertConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        tan_abs_phi = math.tan(math.radians(abs(config.angle)))
        height, width = shape
        shift_y = width * tan_abs_phi
        self.dsize = (width, math.ceil(height + shift_y))

        if config.angle < 0:
            self.trans_mat = np.asarray(
                [(1, 0, 0), (-tan_abs_phi, 1, shift_y)], dtype=np.float32
            )
        elif config.angle > 0:
            self.trans_mat = np.asarray(
                [(1, 0, 0), (tan_abs_phi, 1, 0)], dtype=np.float32
            )
        else:
            self.trans_mat = None
            self.dsize = None

    @property
    def result_shape(self):
        return convert_dsize_to_result_shape(self.dsize)


@attr.define
class RotateConfig(DistortionConfig):
    # [0, 360], clockwise.
    angle: int

    @property
    def is_nop(self):
        return self.angle == 0


class RotateState(DistortionState[RotateConfig]):

    def __init__(self, config: RotateConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        height, width = shape
        angle = config.angle % 360
        rad = math.radians(angle)

        # Quadrant-cased canvas growth + origin shift so the rotated content
        # stays in the positive quadrant (affine.py:198-271).
        shift_x = 0.0
        shift_y = 0.0
        if rad <= math.pi / 2:
            shift_x = height * math.sin(rad)
            dst_width = height * math.sin(rad) + width * math.cos(rad)
            dst_height = height * math.cos(rad) + width * math.sin(rad)
        elif rad <= math.pi:
            shift_rad = rad - math.pi / 2
            shift_x = width * math.sin(shift_rad) + height * math.cos(shift_rad)
            shift_y = height * math.sin(shift_rad)
            dst_width = shift_x
            dst_height = shift_y + width * math.cos(shift_rad)
        elif rad < math.pi * 3 / 2:
            shift_rad = rad - math.pi
            shift_x = width * math.cos(shift_rad)
            shift_y = width * math.sin(shift_rad) + height * math.cos(shift_rad)
            dst_width = shift_x + height * math.sin(shift_rad)
            dst_height = shift_y
        else:
            shift_rad = rad - math.pi * 3 / 2
            shift_y = width * math.cos(shift_rad)
            dst_width = width * math.sin(shift_rad) + height * math.cos(shift_rad)
            dst_height = shift_y + height * math.sin(shift_rad)

        shift_x = math.ceil(shift_x)
        shift_y = math.ceil(shift_y)

        self.trans_mat = np.asarray(
            [
                (math.cos(rad), -math.sin(rad), shift_x),
                (math.sin(rad), math.cos(rad), shift_y),
            ],
            dtype=np.float32,
        )
        self.dsize = (math.ceil(dst_width), math.ceil(dst_height))

    @property
    def result_shape(self):
        return convert_dsize_to_result_shape(self.dsize)


@attr.define
class SkewHoriConfig(DistortionConfig):
    # (-1, 0] shrinks the left side, [0, 1) the right side.
    ratio: float

    @property
    def is_nop(self):
        return self.ratio == 0


class SkewHoriState(DistortionState[SkewHoriConfig]):

    def __init__(self, config: SkewHoriConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        height, width = shape
        src_xy_pairs = [(0, 0), (width - 1, 0), (width - 1, height - 1), (0, height - 1)]

        shrink_size = round(height * abs(config.ratio))
        shrink_up = shrink_size // 2
        shrink_down = shrink_size - shrink_up

        if config.ratio < 0:
            dst_xy_pairs = [
                (0, shrink_up),
                (width - 1, 0),
                (width - 1, height - 1),
                (0, height - shrink_down - 1),
            ]
        else:
            dst_xy_pairs = [
                (0, 0),
                (width - 1, shrink_up),
                (width - 1, height - shrink_down - 1),
                (0, height - 1),
            ]

        self.trans_mat = warp_ops.solve_perspective(
            np.asarray(src_xy_pairs, dtype=np.float64),
            np.asarray(dst_xy_pairs, dtype=np.float64),
        ).astype(np.float32)
        self.dsize = (width, height)

    @property
    def result_shape(self):
        return convert_dsize_to_result_shape(self.dsize)


@attr.define
class SkewVertConfig(DistortionConfig):
    # (-1, 0] shrinks the up side, [0, 1) the down side.
    ratio: float

    @property
    def is_nop(self):
        return self.ratio == 0


class SkewVertState(DistortionState[SkewVertConfig]):

    def __init__(self, config: SkewVertConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        height, width = shape
        src_xy_pairs = [(0, 0), (width - 1, 0), (width - 1, height - 1), (0, height - 1)]

        shrink_size = round(width * abs(config.ratio))
        shrink_left = shrink_size // 2
        shrink_right = shrink_size - shrink_left

        if config.ratio < 0:
            dst_xy_pairs = [
                (shrink_left, 0),
                (width - shrink_right - 1, 0),
                (width - 1, height - 1),
                (0, height - 1),
            ]
        else:
            dst_xy_pairs = [
                (0, 0),
                (width - 1, 0),
                (width - shrink_right - 1, height - 1),
                (shrink_right, height - 1),
            ]

        self.trans_mat = warp_ops.solve_perspective(
            np.asarray(src_xy_pairs, dtype=np.float64),
            np.asarray(dst_xy_pairs, dtype=np.float64),
        ).astype(np.float32)
        self.dsize = (width, height)

    @property
    def result_shape(self):
        return convert_dsize_to_result_shape(self.dsize)


_T_AFFINE_CONFIG = TypeVar(
    '_T_AFFINE_CONFIG',
    ShearHoriConfig, ShearVertConfig, RotateConfig, SkewHoriConfig, SkewVertConfig,
)
_T_AFFINE_STATE = TypeVar(
    '_T_AFFINE_STATE',
    ShearHoriState, ShearVertState, RotateState, SkewHoriState, SkewVertState,
)


def affine_trait_func_mat(config, state, mat: np.ndarray) -> np.ndarray:
    assert state
    if config.is_nop:
        return mat
    assert state.trans_mat is not None and state.dsize is not None
    return affine_mat(state.trans_mat, state.dsize, mat)


def affine_trait_func_image(config, state, image: Image,
                            rng: Optional[RandomGenerator]) -> Image:
    return Image(mat=affine_trait_func_mat(config, state, image.mat))


def affine_trait_func_score_map(config, state, score_map: ScoreMap,
                                rng: Optional[RandomGenerator]) -> ScoreMap:
    mat = affine_trait_func_mat(config, state, score_map.mat)
    if score_map.is_prob:
        mat = np.clip(mat, 0.0, 1.0)
    return ScoreMap(mat=mat, is_prob=score_map.is_prob)


def affine_trait_func_mask(config, state, mask: Mask,
                           rng: Optional[RandomGenerator]) -> Mask:
    return Mask(mat=affine_trait_func_mat(config, state, mask.mat))


def affine_trait_func_points(config, state, shape: Tuple[int, int],
                             points: Union[PointList, PointTuple, Iterable[Point]],
                             rng: Optional[RandomGenerator]) -> PointTuple:
    assert state
    points = PointTuple(points)
    if config.is_nop:
        return points
    assert state.trans_mat is not None
    return affine_points(state.trans_mat, points)


def affine_trait_func_polygons(config, state, shape: Tuple[int, int],
                               polygons: Iterable[Polygon],
                               rng: Optional[RandomGenerator]) -> Sequence[Polygon]:
    assert state
    polygons = tuple(polygons)
    if config.is_nop:
        return polygons
    assert state.trans_mat is not None
    return affine_polygons(state.trans_mat, polygons)


class DistortionAffine(Distortion[_T_AFFINE_CONFIG, _T_AFFINE_STATE]):

    def __init__(self, config_cls: Type[_T_AFFINE_CONFIG],
                 state_cls: Type[_T_AFFINE_STATE]):
        super().__init__(
            config_cls=config_cls,
            state_cls=state_cls,
            func_image=affine_trait_func_image,
            func_mask=affine_trait_func_mask,
            func_score_map=affine_trait_func_score_map,
            func_points=affine_trait_func_points,
            func_polygons=affine_trait_func_polygons,
        )


shear_hori = DistortionAffine(config_cls=ShearHoriConfig, state_cls=ShearHoriState)
shear_vert = DistortionAffine(config_cls=ShearVertConfig, state_cls=ShearVertState)
rotate = DistortionAffine(config_cls=RotateConfig, state_cls=RotateState)
skew_hori = DistortionAffine(config_cls=SkewHoriConfig, state_cls=SkewHoriState)
skew_vert = DistortionAffine(config_cls=SkewVertConfig, state_cls=SkewVertState)
