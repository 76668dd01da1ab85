"""ScoreMap element: float32 H×W raster, optional probability range check.

Capability parity: vkit/element/score_map.py:26-712, including
``from_quad_interpolation`` (inverse bilinear quad→(u,v) solve used for
height-gradient labels; score_map.py:139-283).
"""
from contextlib import ContextDecorator
from typing import Callable, Iterable, List, Optional, Tuple, Union

import attr
import numpy as np

from ..ops.resize_taps import Interpolation, resize_np
from .opt import generate_resized_shape
from .type import ElementSetOperationMode, Shapable


@attr.define
class ScoreMapSetItemConfig:
    value: Union['ScoreMap', np.ndarray, float] = 1.0
    keep_max_value: bool = False
    keep_min_value: bool = False


class WritableScoreMapContextDecorator(ContextDecorator):

    def __init__(self, score_map: 'ScoreMap'):
        super().__init__()
        self.score_map = score_map

    def __enter__(self):
        try:
            self.score_map.mat.flags.writeable = True
        except ValueError:
            object.__setattr__(self.score_map, 'mat', np.array(self.score_map.mat))
            assert self.score_map.mat.flags.writeable

    def __exit__(self, *exc):
        self.score_map.mat.flags.writeable = False


def _inverse_bilinear_uv(
    np_rel_quad: np.ndarray,
    shape: Tuple[int, int],
    np_active_mask: np.ndarray,
) -> np.ndarray:
    """Per-pixel (u, v) of each lattice point inside the quad.

    Quad corners (clockwise): p0 (u=0,v=0), p1 (u=1,v=0), p2 (u=1,v=1),
    p3 (u=0,v=1).  Solves the inverse-bilinear quadratic (same math as
    vkit/element/score_map.py:139-283 / reedbeta quadrilateral interpolation).
    Returns (H, W, 2) float32 with u, v clipped to [0, 1].
    """
    height, width = shape
    p0, p1, p2, p3 = (np_rel_quad[i].astype(np.float32) for i in range(4))

    xs = np.arange(width, dtype=np.float32)[None, :].repeat(height, axis=0)
    ys = np.arange(height, dtype=np.float32)[:, None].repeat(width, axis=1)

    def cross(ax, ay, bx, by):
        return ax * by - ay * bx

    qx = xs - p0[0]
    qy = ys - p0[1]
    b1 = p1 - p0
    b2 = p3 - p0
    b3 = (p0 - p1) - p3 + p2

    scale_a = float(cross(b2[0], b2[1], b3[0], b3[1]))
    np_b = cross(b3[0], b3[1], qx, qy) - float(cross(b1[0], b1[1], b2[0], b2[1]))
    np_c = cross(b1[0], b1[1], qx, qy)

    if abs(scale_a) < 0.001:
        with np.errstate(divide='ignore', invalid='ignore'):
            np_v = np.where(np_b != 0, -np_c / np.where(np_b == 0, 1.0, np_b), 0.0)
    else:
        np_discrim = np.sqrt(np.maximum(np_b**2 - 4 * scale_a * np_c, 0.0))
        scale_i2a = 0.5 / scale_a
        np_v_pos = (-np_b + np_discrim) * scale_i2a
        np_v_neg = (-np_b - np_discrim) * scale_i2a
        pos_valid = ((0.0 <= np_v_pos) & (np_v_pos <= 1.0) & np_active_mask).sum()
        neg_valid = ((0.0 <= np_v_neg) & (np_v_neg <= 1.0) & np_active_mask).sum()
        np_v = np_v_pos if pos_valid >= neg_valid else np_v_neg

    np_v = np.where(np_active_mask, np_v, 0.0)
    np_v = np.clip(np_v, 0.0, 1.0)

    denom_x = b1[0] + b3[0] * np_v
    denom_y = b1[1] + b3[1] * np_v
    use_x = (np.abs(denom_x) > np.abs(denom_y)) & (denom_x != 0.0)
    use_y = (~use_x) & (denom_y != 0.0)
    np_u = np.zeros_like(np_v)
    with np.errstate(divide='ignore', invalid='ignore'):
        np_u = np.where(use_x, (qx - b2[0] * np_v) / np.where(use_x, denom_x, 1.0), np_u)
        np_u = np.where(use_y, (qy - b2[1] * np_v) / np.where(use_y, denom_y, 1.0), np_u)
    np_u = np.where(np_active_mask, np_u, 0.0)
    np_u = np.clip(np_u, 0.0, 1.0)

    return np.stack((np_u, np_v), axis=-1).astype(np.float32)


@attr.define(frozen=True, eq=False)
class ScoreMap(Shapable):
    mat: np.ndarray
    box: Optional['Box'] = None
    is_prob: bool = True

    def __attrs_post_init__(self):
        if self.mat.ndim != 2:
            raise RuntimeError('ndim should == 2.')
        if self.box and self.shape != self.box.shape:
            raise RuntimeError('self.shape != box.shape.')
        if self.mat.dtype != np.float32:
            raise RuntimeError('mat.dtype != np.float32')
        self.mat.flags.writeable = False
        if self.is_prob:
            if self.mat.size and (self.mat.min() < 0.0 or self.mat.max() > 1.0):
                raise RuntimeError('score not in range [0.0, 1.0]')

    ###############
    # Constructor #
    ###############
    @classmethod
    def from_shape(
        cls,
        shape: Tuple[int, int],
        value: float = 0.0,
        is_prob: bool = True,
    ) -> 'ScoreMap':
        height, width = shape
        if is_prob:
            assert 0.0 <= value <= 1.0
        if value == 0:
            # calloc path: zero pages are mapped lazily (np.full eagerly
            # writes the whole buffer — seconds at page sizes on
            # fault-slow hosts).
            mat = np.zeros((height, width), dtype=np.float32)
        else:
            mat = np.full((height, width), fill_value=value, dtype=np.float32)
        return cls(mat=mat, is_prob=is_prob)

    @classmethod
    def from_shapable(
        cls,
        shapable: Shapable,
        value: float = 0.0,
        is_prob: bool = True,
    ) -> 'ScoreMap':
        return cls.from_shape(shape=shapable.shape, value=value, is_prob=is_prob)

    @classmethod
    def from_quad_interpolation(
        cls,
        point0: 'Point',
        point1: 'Point',
        point2: 'Point',
        point3: 'Point',
        func_np_uv_to_mat: Callable[[np.ndarray], np.ndarray],
        is_prob: bool = True,
    ) -> 'ScoreMap':
        polygon = Polygon.create((point0, point1, point2, point3))
        bounding_box = polygon.bounding_box
        np_rel_quad = polygon.self_relative_polygon.to_smooth_np_array()
        np_active_mask = polygon.internals.np_mask
        np_uv = _inverse_bilinear_uv(np_rel_quad, bounding_box.shape, np_active_mask)
        mat = func_np_uv_to_mat(np_uv)
        return cls(mat=mat, box=bounding_box, is_prob=is_prob)

    ############
    # Property #
    ############
    @property
    def height(self) -> int:
        return self.mat.shape[0]

    @property
    def width(self) -> int:
        return self.mat.shape[1]

    @property
    def equivalent_box(self) -> 'Box':
        return self.box or Box.from_shapable(self)

    @property
    def writable_context(self):
        return WritableScoreMapContextDecorator(self)

    ############
    # Operator #
    ############
    def copy(self) -> 'ScoreMap':
        return attr.evolve(self, mat=self.mat.copy())

    def assign_mat(self, mat: np.ndarray):
        with self.writable_context:
            object.__setattr__(self, 'mat', mat)

    @classmethod
    def unpack_element_value_pairs(
        cls,
        is_prob: bool,
        element_value_pairs,
    ):
        elements = []
        values = []
        for element, value in element_value_pairs:
            elements.append(element)
            if is_prob and isinstance(value, float):
                assert 0.0 <= value <= 1.0
            values.append(value)
        return elements, values

    def fill_by_box_value_pairs(
        self,
        box_value_pairs: Iterable[Tuple['Box', Union['ScoreMap', np.ndarray, float]]],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
        skip_values_uniqueness_check: bool = False,
    ):
        boxes, values = self.unpack_element_value_pairs(self.is_prob, box_value_pairs)

        boxes_mask = generate_fill_by_boxes_mask(self.shape, boxes, mode)
        if boxes_mask is None:
            for box, value in zip(boxes, values):
                box.fill_score_map(
                    score_map=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = check_elements_uniqueness(values)

        if unique:
            boxes_mask.fill_score_map(
                score_map=self,
                value=values[0],
                keep_max_value=keep_max_value,
                keep_min_value=keep_min_value,
            )
        else:
            for box, value in zip(boxes, values):
                box_mask = box.extract_mask(boxes_mask).to_box_attached(box)
                box_mask.fill_score_map(
                    score_map=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )

    def fill_by_boxes(
        self,
        boxes: Iterable['Box'],
        value: Union['ScoreMap', np.ndarray, float] = 1.0,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.fill_by_box_value_pairs(
            box_value_pairs=((box, value) for box in boxes),
            mode=mode,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
            skip_values_uniqueness_check=True,
        )

    def fill_by_polygon_value_pairs(
        self,
        polygon_value_pairs: Iterable[
            Tuple['Polygon', Union['ScoreMap', np.ndarray, float]]
        ],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
        skip_values_uniqueness_check: bool = False,
    ):
        polygons, values = self.unpack_element_value_pairs(self.is_prob, polygon_value_pairs)

        polygons_mask = generate_fill_by_polygons_mask(self.shape, polygons, mode)
        if polygons_mask is None:
            for polygon, value in zip(polygons, values):
                polygon.fill_score_map(
                    score_map=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = check_elements_uniqueness(values)

        if unique:
            polygons_mask.fill_score_map(
                score_map=self,
                value=values[0],
                keep_max_value=keep_max_value,
                keep_min_value=keep_min_value,
            )
        else:
            for polygon, value in zip(polygons, values):
                bounding_box = polygon.to_bounding_box()
                polygon_mask = bounding_box.extract_mask(polygons_mask)
                polygon_mask = polygon_mask.to_box_attached(bounding_box)
                polygon_mask.fill_score_map(
                    score_map=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )

    def fill_by_polygons(
        self,
        polygons: Iterable['Polygon'],
        value: Union['ScoreMap', np.ndarray, float] = 1.0,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.fill_by_polygon_value_pairs(
            polygon_value_pairs=((polygon, value) for polygon in polygons),
            mode=mode,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
            skip_values_uniqueness_check=True,
        )

    def fill_by_mask_value_pairs(
        self,
        mask_value_pairs: Iterable[Tuple['Mask', Union['ScoreMap', np.ndarray, float]]],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
        skip_values_uniqueness_check: bool = False,
    ):
        masks, values = self.unpack_element_value_pairs(self.is_prob, mask_value_pairs)

        masks_mask = generate_fill_by_masks_mask(self.shape, masks, mode)
        if masks_mask is None:
            for mask, value in zip(masks, values):
                mask.fill_score_map(
                    score_map=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = check_elements_uniqueness(values)

        if unique:
            masks_mask.fill_score_map(
                score_map=self,
                value=values[0],
                keep_max_value=keep_max_value,
                keep_min_value=keep_min_value,
            )
        else:
            for mask, value in zip(masks, values):
                if mask.box:
                    boxed_mask = mask.box.extract_mask(masks_mask)
                else:
                    boxed_mask = masks_mask
                boxed_mask = boxed_mask.copy()
                mask.to_inverted_mask().fill_mask(boxed_mask, value=0)
                boxed_mask.fill_score_map(
                    score_map=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )

    def fill_by_masks(
        self,
        masks: Iterable['Mask'],
        value: Union['ScoreMap', np.ndarray, float] = 1.0,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.fill_by_mask_value_pairs(
            mask_value_pairs=((mask, value) for mask in masks),
            mode=mode,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
            skip_values_uniqueness_check=True,
        )

    def __setitem__(
        self,
        element: Union['Box', 'Polygon', 'Mask'],
        config: Union['ScoreMap', np.ndarray, float, ScoreMapSetItemConfig],
    ):
        if not isinstance(config, ScoreMapSetItemConfig):
            value = config
            keep_max_value = False
            keep_min_value = False
        else:
            value = config.value
            keep_max_value = config.keep_max_value
            keep_min_value = config.keep_min_value
        element.fill_score_map(
            score_map=self,
            value=value,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def __getitem__(self, element: Union['Box', 'Polygon', 'Mask']) -> 'ScoreMap':
        return element.extract_score_map(self)

    def fill_by_quad_interpolation(
        self,
        point0: 'Point',
        point1: 'Point',
        point2: 'Point',
        point3: 'Point',
        func_np_uv_to_mat: Callable[[np.ndarray], np.ndarray],
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        score_map = self.from_quad_interpolation(
            point0=point0,
            point1=point1,
            point2=point2,
            point3=point3,
            func_np_uv_to_mat=func_np_uv_to_mat,
            is_prob=self.is_prob,
        )
        assert score_map.box
        with self.writable_context:
            score_map.box.fill_np_array(
                mat=self.mat,
                value=score_map.mat,
                np_mask=(score_map.mat > 0.0),
                keep_max_value=keep_max_value,
                keep_min_value=keep_min_value,
            )

    def to_shifted_score_map(self, offset_y: int = 0, offset_x: int = 0) -> 'ScoreMap':
        assert self.box
        shifted_box = self.box.to_shifted_box(offset_y=offset_y, offset_x=offset_x)
        return attr.evolve(self, box=shifted_box)

    def to_conducted_resized_score_map(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
        interpolation: Interpolation = Interpolation.CUBIC,
    ) -> 'ScoreMap':
        assert self.box
        resized_box = self.box.to_conducted_resized_box(
            shapable_or_shape=shapable_or_shape,
            resized_height=resized_height,
            resized_width=resized_width,
        )
        resized_score_map = self.to_box_detached().to_resized_score_map(
            resized_height=resized_box.height,
            resized_width=resized_box.width,
            interpolation=interpolation,
        )
        return resized_score_map.to_box_attached(resized_box)

    # Alias matching the (misnamed) reference method, score_map.py:595.
    to_conducted_resized_polygon = to_conducted_resized_score_map

    def to_resized_score_map(
        self,
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
        interpolation: Interpolation = Interpolation.CUBIC,
    ) -> 'ScoreMap':
        assert not self.box
        resized_height, resized_width = generate_resized_shape(
            height=self.height,
            width=self.width,
            resized_height=resized_height,
            resized_width=resized_width,
        )
        mat = resize_np(self.mat, (resized_height, resized_width), interpolation)
        if self.is_prob:
            mat = np.clip(mat, 0.0, 1.0)
        return ScoreMap(mat=mat, is_prob=self.is_prob)

    def to_cropped_score_map(
        self,
        up: Optional[int] = None,
        down: Optional[int] = None,
        left: Optional[int] = None,
        right: Optional[int] = None,
    ) -> 'ScoreMap':
        assert not self.box
        up = up or 0
        down = down or self.height - 1
        left = left or 0
        right = right or self.width - 1
        return attr.evolve(self, mat=self.mat[up:down + 1, left:right + 1])

    def to_box_attached(self, box: 'Box') -> 'ScoreMap':
        assert self.shape == box.shape
        return attr.evolve(self, box=box)

    def to_box_detached(self) -> 'ScoreMap':
        assert self.box
        return attr.evolve(self, box=None)

    def fill_np_array(
        self,
        mat: np.ndarray,
        value: Union[np.ndarray, Tuple[float, ...], float],
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.equivalent_box.fill_np_array(
            mat=mat,
            value=value,
            alpha=self,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def fill_image(
        self,
        image: 'Image',
        value: Union['Image', np.ndarray, Tuple[int, ...], int],
    ):
        self.equivalent_box.fill_image(
            image=image,
            value=value,
            alpha=self,
        )

    def to_mask(self, threshold: float = 0.0) -> 'Mask':
        mat = (self.mat > threshold).astype(np.uint8)
        return Mask(mat=mat, box=self.box)


def generate_fill_by_score_maps_mask(
    shape: Tuple[int, int],
    score_maps: Iterable['ScoreMap'],
    mode: ElementSetOperationMode,
):
    if mode == ElementSetOperationMode.UNION:
        return None
    return Mask.from_score_maps(shape, score_maps, mode)


# Cyclic imports at module bottom, by design.
from .uniqueness import check_elements_uniqueness  # noqa: E402
from .point import Point  # noqa: E402
from .box import Box, generate_fill_by_boxes_mask  # noqa: E402
from .polygon import Polygon, generate_fill_by_polygons_mask  # noqa: E402
from .mask import Mask, generate_fill_by_masks_mask  # noqa: E402
from .image import Image  # noqa: E402
