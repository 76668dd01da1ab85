"""Box element: inclusive integer bounds + extract/fill plumbing.

Capability parity: vkit/element/box.py:33-447.  ``up/down/left/right`` are
inclusive; an element's optional attached ``box`` means "this raster lives at
this offset inside a larger page", and every fill/extract resolves relative
boxes through ``get_boxes_for_box_attached_opt``.  The STRtree-backed overlap
validator (box.py:419-428) is replaced by a vectorized numpy interval check.
"""
import math
from typing import Iterable, Optional, Tuple, Union

import attr
import numpy as np

from .opt import (
    clip_val,
    extract_shape_from_shapable_or_shape,
    fill_np_array,
    generate_shape_and_resized_shape,
    resize_val,
)
from .type import ElementSetOperationMode, Shapable


@attr.define(frozen=True)
class Box(Shapable):
    up: int
    down: int
    left: int
    right: int

    @classmethod
    def from_shape(cls, shape: Tuple[int, int]) -> 'Box':
        height, width = shape
        return cls(up=0, down=height - 1, left=0, right=width - 1)

    @classmethod
    def from_shapable(cls, shapable: Shapable) -> 'Box':
        return cls.from_shape(shapable.shape)

    @classmethod
    def from_boxes(cls, boxes: Iterable['Box']) -> 'Box':
        boxes = tuple(boxes)
        assert boxes
        return cls(
            up=min(box.up for box in boxes),
            down=max(box.down for box in boxes),
            left=min(box.left for box in boxes),
            right=max(box.right for box in boxes),
        )

    @property
    def height(self) -> int:
        return self.down + 1 - self.up

    @property
    def width(self) -> int:
        return self.right + 1 - self.left

    @property
    def valid(self) -> bool:
        return (0 <= self.up <= self.down) and (0 <= self.left <= self.right)

    def to_polygon(self, step: Optional[int] = None):
        if self.up == self.down or self.left == self.right:
            raise RuntimeError(f'Cannot convert box={self} to polygon.')

        # Corner ordering contract (up-left -> up-right -> down-right ->
        # down-left) is relied on by char labeling; vkit/element/box.py:94-135.
        if step is None:
            points = PointTuple.from_xy_pairs((
                (self.left, self.up),
                (self.right, self.up),
                (self.right, self.down),
                (self.left, self.down),
            ))
        else:
            assert step > 0
            xs = list(range(self.left, self.right + 1, step))
            if xs[-1] < self.right:
                xs.append(self.right)
            ys = list(range(self.up, self.down + 1, step))
            if ys[-1] == self.down:
                ys.pop()
            ys.pop(0)

            points = PointList()
            for x in xs:
                points.append(Point.create(y=self.up, x=x))
            for y in ys:
                points.append(Point.create(y=y, x=self.right))
            for x in reversed(xs):
                points.append(Point.create(y=self.down, x=x))
            for y in reversed(ys):
                points.append(Point.create(y=y, x=self.left))

        return Polygon.create(points=points)

    def get_center_point(self) -> 'Point':
        return Point.create(y=(self.up + self.down) / 2, x=(self.left + self.right) / 2)

    def to_clipped_box(self, shapable_or_shape: Union[Shapable, Tuple[int, int]]) -> 'Box':
        height, width = extract_shape_from_shapable_or_shape(shapable_or_shape)
        return Box(
            up=clip_val(self.up, height),
            down=clip_val(self.down, height),
            left=clip_val(self.left, width),
            right=clip_val(self.right, width),
        )

    def to_conducted_resized_box(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ) -> 'Box':
        height, width, resized_height, resized_width = generate_shape_and_resized_shape(
            shapable_or_shape=shapable_or_shape,
            resized_height=resized_height,
            resized_width=resized_width,
        )
        return Box(
            up=round(resize_val(self.up, height, resized_height)),
            down=round(resize_val(self.down, height, resized_height)),
            left=round(resize_val(self.left, width, resized_width)),
            right=round(resize_val(self.right, width, resized_width)),
        )

    def to_resized_box(
        self,
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ) -> 'Box':
        return self.to_conducted_resized_box(
            shapable_or_shape=self,
            resized_height=resized_height,
            resized_width=resized_width,
        )

    def to_shifted_box(self, offset_y: int = 0, offset_x: int = 0) -> 'Box':
        return Box(
            up=self.up + offset_y,
            down=self.down + offset_y,
            left=self.left + offset_x,
            right=self.right + offset_x,
        )

    def to_relative_box(self, origin_y: int, origin_x: int) -> 'Box':
        return self.to_shifted_box(offset_y=-origin_y, offset_x=-origin_x)

    def to_dilated_box(self, ratio: float, clip_long_side: bool = False) -> 'Box':
        expand_vert = math.ceil(self.height * ratio / 2)
        expand_hori = math.ceil(self.width * ratio / 2)
        if clip_long_side:
            expand_min = min(expand_vert, expand_hori)
            expand_vert = expand_min
            expand_hori = expand_min
        return Box(
            up=self.up - expand_vert,
            down=self.down + expand_vert,
            left=self.left - expand_hori,
            right=self.right + expand_hori,
        )

    def get_boxes_for_box_attached_opt(self, element_box: Optional['Box']):
        if element_box is None:
            return self, None
        assert element_box.up <= self.up <= self.down <= element_box.down
        assert element_box.left <= self.left <= self.right <= element_box.right
        relative_box = self.to_relative_box(
            origin_y=element_box.up,
            origin_x=element_box.left,
        )
        return relative_box, self

    def extract_np_array(self, mat: np.ndarray) -> np.ndarray:
        assert 0 <= self.up <= self.down <= mat.shape[0]
        assert 0 <= self.left <= self.right <= mat.shape[1]
        return mat[self.up:self.down + 1, self.left:self.right + 1]

    def extract_mask(self, mask: 'Mask') -> 'Mask':
        relative_box, new_box = self.get_boxes_for_box_attached_opt(mask.box)
        if relative_box.shape == mask.shape:
            return mask
        return attr.evolve(mask, mat=relative_box.extract_np_array(mask.mat), box=new_box)

    def extract_score_map(self, score_map: 'ScoreMap') -> 'ScoreMap':
        relative_box, new_box = self.get_boxes_for_box_attached_opt(score_map.box)
        if relative_box.shape == score_map.shape:
            return score_map
        return attr.evolve(
            score_map, mat=relative_box.extract_np_array(score_map.mat), box=new_box
        )

    def extract_image(self, image: 'Image') -> 'Image':
        relative_box, new_box = self.get_boxes_for_box_attached_opt(image.box)
        if relative_box.shape == image.shape:
            return image
        return attr.evolve(image, mat=relative_box.extract_np_array(image.mat), box=new_box)

    def prep_mat_and_value(
        self,
        mat: np.ndarray,
        value: Union[np.ndarray, Tuple[float, ...], float],
    ):
        mat_shape_before = (mat.shape[0], mat.shape[1])
        if mat_shape_before != self.shape:
            mat = self.extract_np_array(mat)

        if isinstance(value, np.ndarray):
            value_shape_before = (value.shape[0], value.shape[1])
            if value_shape_before != (mat.shape[0], mat.shape[1]):
                assert value_shape_before == mat_shape_before
                value = self.extract_np_array(value)
            if value.dtype != mat.dtype:
                value = value.astype(mat.dtype)

        return mat, value

    @classmethod
    def get_np_mask_from_element_mask(
        cls,
        element_mask: Optional[Union['Mask', np.ndarray]],
    ) -> Optional[np.ndarray]:
        if element_mask is None:
            return None
        if isinstance(element_mask, Mask):
            # Mask.box is deliberately ignored here (vkit/element/box.py:301-309).
            return element_mask.np_mask
        return element_mask

    def fill_np_array(
        self,
        mat: np.ndarray,
        value: Union[np.ndarray, Tuple[float, ...], float],
        np_mask: Optional[np.ndarray] = None,
        alpha: Union['ScoreMap', np.ndarray, float] = 1.0,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        mat, value = self.prep_mat_and_value(mat, value)

        if isinstance(alpha, ScoreMap):
            assert alpha.is_prob
            alpha = alpha.mat

        if np_mask is None and isinstance(alpha, np.ndarray):
            # Sparse-alpha optimization (vkit/element/box.py:329-331).
            np_mask = alpha > 0.0

        fill_np_array(
            mat=mat,
            value=value,
            np_mask=np_mask,
            alpha=alpha,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def fill_mask(
        self,
        mask: 'Mask',
        value: Union['Mask', np.ndarray, int] = 1,
        mask_mask: Optional[Union['Mask', np.ndarray]] = None,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        relative_box, _ = self.get_boxes_for_box_attached_opt(mask.box)

        if isinstance(value, Mask):
            if value.shape != self.shape:
                value = self.extract_mask(value)
            value = value.mat

        np_mask = self.get_np_mask_from_element_mask(mask_mask)

        with mask.writable_context:
            relative_box.fill_np_array(
                mask.mat,
                value,
                np_mask=np_mask,
                keep_max_value=keep_max_value,
                keep_min_value=keep_min_value,
            )

    def fill_score_map(
        self,
        score_map: 'ScoreMap',
        value: Union['ScoreMap', np.ndarray, float],
        score_map_mask: Optional[Union['Mask', np.ndarray]] = None,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        relative_box, _ = self.get_boxes_for_box_attached_opt(score_map.box)

        if isinstance(value, ScoreMap):
            if value.shape != self.shape:
                value = self.extract_score_map(value)
            value = value.mat

        np_mask = self.get_np_mask_from_element_mask(score_map_mask)

        with score_map.writable_context:
            relative_box.fill_np_array(
                score_map.mat,
                value,
                np_mask=np_mask,
                keep_max_value=keep_max_value,
                keep_min_value=keep_min_value,
            )

    def fill_image(
        self,
        image: 'Image',
        value: Union['Image', np.ndarray, Tuple[int, ...], int],
        image_mask: Optional[Union['Mask', np.ndarray]] = None,
        alpha: Union['ScoreMap', np.ndarray, float] = 1.0,
    ):
        relative_box, _ = self.get_boxes_for_box_attached_opt(image.box)

        if isinstance(value, Image):
            if value.shape != self.shape:
                value = self.extract_image(value)
            value = value.mat

        np_mask = self.get_np_mask_from_element_mask(image_mask)

        with image.writable_context:
            relative_box.fill_np_array(
                image.mat,
                value,
                np_mask=np_mask,
                alpha=alpha,
            )


class BoxOverlappingValidator:
    """Vectorized box-overlap test (replaces the shapely STRtree at
    vkit/element/box.py:419-428)."""

    def __init__(self, boxes: Iterable[Box]):
        boxes = tuple(boxes)
        if boxes:
            self.np_bounds = np.array(
                [(box.up, box.down, box.left, box.right) for box in boxes],
                dtype=np.int64,
            )
        else:
            self.np_bounds = np.zeros((0, 4), dtype=np.int64)

    def is_overlapped(self, box: Box) -> bool:
        if not len(self.np_bounds):
            return False
        ups, downs, lefts, rights = self.np_bounds.T
        overlap = (
            (ups <= box.down) & (box.up <= downs)
            & (lefts <= box.right) & (box.left <= rights)
        )
        return bool(overlap.any())


def generate_fill_by_boxes_mask(
    shape: Tuple[int, int],
    boxes: Iterable[Box],
    mode: ElementSetOperationMode,
):
    if mode == ElementSetOperationMode.UNION:
        return None
    return Mask.from_boxes(shape, boxes, mode)


# Cyclic imports at module bottom, by design (mirrors vkit/element/box.py:442-447).
from .point import Point, PointList, PointTuple  # noqa: E402
from .polygon import Polygon  # noqa: E402
from .mask import Mask  # noqa: E402
from .score_map import ScoreMap  # noqa: E402
from .image import Image  # noqa: E402
