"""Mask element: uint8 H×W raster with set-op constructors and fill plumbing.

Capability parity: vkit/element/mask.py:36-769.  cv2.findContours is replaced
by the first-party contour tracer (vkit_tpu/geometry), cv2.resize by the
tap-matrix resize (vkit_tpu/ops/resize_taps).
"""
import logging
from contextlib import ContextDecorator
from typing import Iterable, List, Optional, Sequence, Tuple, TypeVar, Union

import attr
import numpy as np

from .. import geometry
from ..ops.resize_taps import Interpolation, resize_np
from .opt import generate_resized_shape
from .type import ElementSetOperationMode, Shapable

logger = logging.getLogger(__name__)

_E = TypeVar('_E', 'Box', 'Polygon')


@attr.define
class MaskSetItemConfig:
    value: Union['Mask', np.ndarray, int] = 1
    keep_max_value: bool = False
    keep_min_value: bool = False


class WritableMaskContextDecorator(ContextDecorator):

    def __init__(self, mask: 'Mask'):
        super().__init__()
        self.mask = mask

    def __enter__(self):
        try:
            self.mask.mat.flags.writeable = True
        except ValueError:
            # Copy-on-write when the array doesn't own its buffer.
            object.__setattr__(self.mask, 'mat', np.array(self.mask.mat))
            assert self.mask.mat.flags.writeable

    def __exit__(self, *exc):
        self.mask.mat.flags.writeable = False
        self.mask.set_np_mask_out_of_date()


@attr.define(frozen=True, eq=False)
class Mask(Shapable):
    mat: np.ndarray
    box: Optional['Box'] = None
    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    def __attrs_post_init__(self):
        if self.mat.dtype != np.uint8:
            raise RuntimeError('mat.dtype != np.uint8')
        if self.mat.ndim != 2:
            raise RuntimeError('ndim should == 2.')
        self.mat.flags.writeable = False
        if self.box and self.shape != self.box.shape:
            raise RuntimeError('self.shape != box.shape.')

    ###############
    # Constructor #
    ###############
    @classmethod
    def from_shape(cls, shape: Tuple[int, int], value: int = 0) -> 'Mask':
        height, width = shape
        if value == 0:
            mat = np.zeros((height, width), dtype=np.uint8)
        else:
            mat = np.full((height, width), value, dtype=np.uint8)
        return cls(mat=mat)

    @classmethod
    def from_shapable(cls, shapable: Shapable, value: int = 0) -> 'Mask':
        return cls.from_shape(shapable.shape, value=value)

    @classmethod
    def _unpack_shape_or_box(cls, shape_or_box: Union[Tuple[int, int], 'Box']):
        if isinstance(shape_or_box, Box):
            return shape_or_box.shape, shape_or_box
        return shape_or_box, None

    @classmethod
    def _from_np_active_count(
        cls,
        shape: Tuple[int, int],
        mode: ElementSetOperationMode,
        np_active_count: np.ndarray,
        attached_box: Optional['Box'],
    ) -> 'Mask':
        mask = Mask.from_shape(shape)
        with mask.writable_context:
            if mode == ElementSetOperationMode.UNION:
                mask.mat[np_active_count > 0] = 1
            elif mode == ElementSetOperationMode.DISTINCT:
                mask.mat[np_active_count == 1] = 1
            elif mode == ElementSetOperationMode.INTERSECT:
                mask.mat[np_active_count > 1] = 1
            else:
                raise NotImplementedError()
        if attached_box:
            mask = mask.to_box_attached(attached_box)
        return mask

    @classmethod
    def from_boxes(
        cls,
        shape_or_box: Union[Tuple[int, int], 'Box'],
        boxes: Iterable['Box'],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
    ) -> 'Mask':
        shape, attached_box = cls._unpack_shape_or_box(shape_or_box)
        np_active_count = np.zeros(shape, dtype=np.int32)
        for box in boxes:
            if attached_box:
                box = box.to_relative_box(origin_y=attached_box.up, origin_x=attached_box.left)
            box.extract_np_array(np_active_count)[...] += 1
        return cls._from_np_active_count(shape, mode, np_active_count, attached_box)

    @classmethod
    def from_polygons(
        cls,
        shape_or_box: Union[Tuple[int, int], 'Box'],
        polygons: Iterable['Polygon'],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
    ) -> 'Mask':
        shape, attached_box = cls._unpack_shape_or_box(shape_or_box)
        np_active_count = np.zeros(shape, dtype=np.int32)
        for polygon in polygons:
            box = polygon.bounding_box
            if attached_box:
                box = box.to_relative_box(origin_y=attached_box.up, origin_x=attached_box.left)
            np_boxed = box.extract_np_array(np_active_count)
            np_boxed[polygon.internals.np_mask] += 1
        return cls._from_np_active_count(shape, mode, np_active_count, attached_box)

    @classmethod
    def from_masks(
        cls,
        shape_or_box: Union[Tuple[int, int], 'Box'],
        masks: Iterable['Mask'],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
    ) -> 'Mask':
        shape, attached_box = cls._unpack_shape_or_box(shape_or_box)
        np_active_count = np.zeros(shape, dtype=np.int32)
        for mask in masks:
            if mask.box:
                box = mask.box
                if attached_box:
                    box = box.to_relative_box(
                        origin_y=attached_box.up, origin_x=attached_box.left
                    )
                np_boxed = box.extract_np_array(np_active_count)
            else:
                np_boxed = np_active_count
            np_boxed[mask.np_mask] += 1
        return cls._from_np_active_count(shape, mode, np_active_count, attached_box)

    @classmethod
    def from_score_maps(
        cls,
        shape_or_box: Union[Tuple[int, int], 'Box'],
        score_maps: Iterable['ScoreMap'],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
    ) -> 'Mask':
        shape, attached_box = cls._unpack_shape_or_box(shape_or_box)
        np_active_count = np.zeros(shape, dtype=np.int32)
        for score_map in score_maps:
            if score_map.box:
                box = score_map.box
                if attached_box:
                    box = box.to_relative_box(
                        origin_y=attached_box.up, origin_x=attached_box.left
                    )
                np_boxed = box.extract_np_array(np_active_count)
            else:
                np_boxed = np_active_count
            np_boxed[score_map.to_mask().np_mask] += 1
        return cls._from_np_active_count(shape, mode, np_active_count, attached_box)

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
    def np_mask(self) -> np.ndarray:
        np_mask = self._cache.get('np_mask')
        if np_mask is None:
            np_mask = self.mat > 0
            self._cache['np_mask'] = np_mask
        return np_mask

    @property
    def writable_context(self):
        return WritableMaskContextDecorator(self)

    ############
    # Operator #
    ############
    def copy(self) -> 'Mask':
        return attr.evolve(self, mat=self.mat.copy())

    def set_np_mask_out_of_date(self):
        self._cache.pop('np_mask', None)

    def assign_mat(self, mat: np.ndarray):
        with self.writable_context:
            object.__setattr__(self, 'mat', mat)

    @classmethod
    def unpack_element_value_pairs(
        cls,
        element_value_pairs: Iterable[Tuple[_E, Union['Mask', np.ndarray, int]]],
    ):
        elements: List[_E] = []
        values: List[Union[Mask, np.ndarray, int]] = []
        for element, value in element_value_pairs:
            elements.append(element)
            values.append(value)
        return elements, values

    def fill_by_box_value_pairs(
        self,
        box_value_pairs: Iterable[Tuple['Box', Union['Mask', np.ndarray, int]]],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
        skip_values_uniqueness_check: bool = False,
    ):
        boxes, values = self.unpack_element_value_pairs(box_value_pairs)

        boxes_mask = generate_fill_by_boxes_mask(self.shape, boxes, mode)
        if boxes_mask is None:
            for box, value in zip(boxes, values):
                box.fill_mask(
                    mask=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = check_elements_uniqueness(values)

        if unique:
            boxes_mask.fill_mask(
                mask=self,
                value=values[0],
                keep_max_value=keep_max_value,
                keep_min_value=keep_min_value,
            )
        else:
            for box, value in zip(boxes, values):
                box_mask = box.extract_mask(boxes_mask).to_box_attached(box)
                box_mask.fill_mask(
                    mask=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )

    def fill_by_boxes(
        self,
        boxes: Iterable['Box'],
        value: Union['Mask', np.ndarray, int] = 1,
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
        polygon_value_pairs: Iterable[Tuple['Polygon', Union['Mask', np.ndarray, int]]],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
        skip_values_uniqueness_check: bool = False,
    ):
        polygons, values = self.unpack_element_value_pairs(polygon_value_pairs)

        polygons_mask = generate_fill_by_polygons_mask(self.shape, polygons, mode)
        if polygons_mask is None:
            for polygon, value in zip(polygons, values):
                polygon.fill_mask(
                    mask=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = check_elements_uniqueness(values)

        if unique:
            polygons_mask.fill_mask(
                mask=self,
                value=values[0],
                keep_max_value=keep_max_value,
                keep_min_value=keep_min_value,
            )
        else:
            for polygon, value in zip(polygons, values):
                bounding_box = polygon.to_bounding_box()
                polygon_mask = bounding_box.extract_mask(polygons_mask)
                polygon_mask = polygon_mask.to_box_attached(bounding_box)
                polygon_mask.fill_mask(
                    mask=self,
                    value=value,
                    keep_max_value=keep_max_value,
                    keep_min_value=keep_min_value,
                )

    def fill_by_polygons(
        self,
        polygons: Iterable['Polygon'],
        value: Union['Mask', np.ndarray, int] = 1,
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

    def __setitem__(
        self,
        element: Union['Box', 'Polygon'],
        config: Union['Mask', np.ndarray, int, MaskSetItemConfig],
    ):
        if not isinstance(config, MaskSetItemConfig):
            value = config
            keep_max_value = False
            keep_min_value = False
        else:
            value = config.value
            keep_max_value = config.keep_max_value
            keep_min_value = config.keep_min_value
        element.fill_mask(
            mask=self,
            value=value,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def __getitem__(self, element: Union['Box', 'Polygon']) -> 'Mask':
        return element.extract_mask(self)

    def to_inverted_mask(self) -> 'Mask':
        mat = (~self.np_mask).astype(np.uint8)
        return attr.evolve(self, mat=mat)

    def to_shifted_mask(self, offset_y: int = 0, offset_x: int = 0) -> 'Mask':
        assert self.box
        shifted_box = self.box.to_shifted_box(offset_y=offset_y, offset_x=offset_x)
        return attr.evolve(self, box=shifted_box)

    def to_resized_mask(
        self,
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
        interpolation: Interpolation = Interpolation.CUBIC,
        binarization_threshold: int = 0,
    ) -> 'Mask':
        assert not self.box
        resized_height, resized_width = generate_resized_shape(
            height=self.height,
            width=self.width,
            resized_height=resized_height,
            resized_width=resized_width,
        )
        # Upscale through 0/255 then threshold, to keep precision
        # (vkit/element/mask.py:454-479).
        mat = self.np_mask.astype(np.uint8) * 255
        mat = resize_np(mat, (resized_height, resized_width), interpolation)
        mat = (mat > binarization_threshold).astype(np.uint8)
        return Mask(mat=mat)

    def to_conducted_resized_mask(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
        interpolation: Interpolation = Interpolation.CUBIC,
        binarization_threshold: int = 0,
    ) -> 'Mask':
        assert self.box
        resized_box = self.box.to_conducted_resized_box(
            shapable_or_shape=shapable_or_shape,
            resized_height=resized_height,
            resized_width=resized_width,
        )
        resized_mask = self.to_box_detached().to_resized_mask(
            resized_height=resized_box.height,
            resized_width=resized_box.width,
            interpolation=interpolation,
            binarization_threshold=binarization_threshold,
        )
        return resized_mask.to_box_attached(resized_box)

    def to_cropped_mask(
        self,
        up: Optional[int] = None,
        down: Optional[int] = None,
        left: Optional[int] = None,
        right: Optional[int] = None,
    ) -> 'Mask':
        assert not self.box
        up = up or 0
        down = down or self.height - 1
        left = left or 0
        right = right or self.width - 1
        return attr.evolve(self, mat=self.mat[up:down + 1, left:right + 1])

    def to_box_attached(self, box: 'Box') -> 'Mask':
        assert self.shape == box.shape
        return attr.evolve(self, box=box)

    def to_box_detached(self) -> 'Mask':
        assert self.box
        return attr.evolve(self, box=None)

    def fill_np_array(
        self,
        mat: np.ndarray,
        value: Union[np.ndarray, Tuple[float, ...], float],
        alpha: Union['ScoreMap', np.ndarray, float] = 1.0,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.equivalent_box.fill_np_array(
            mat=mat,
            value=value,
            np_mask=self.np_mask,
            alpha=alpha,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def extract_mask(self, mask: 'Mask') -> 'Mask':
        mask = self.equivalent_box.extract_mask(mask)
        mask = mask.copy()
        self.to_inverted_mask().fill_mask(mask, value=0)
        return mask

    def fill_mask(
        self,
        mask: 'Mask',
        value: Union['Mask', np.ndarray, int] = 1,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.equivalent_box.fill_mask(
            mask=mask,
            value=value,
            mask_mask=self,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def extract_score_map(self, score_map: 'ScoreMap') -> 'ScoreMap':
        score_map = self.equivalent_box.extract_score_map(score_map)
        score_map = score_map.copy()
        self.to_inverted_mask().fill_score_map(score_map, value=0.0)
        return score_map

    def fill_score_map(
        self,
        score_map: 'ScoreMap',
        value: Union['ScoreMap', np.ndarray, float],
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.equivalent_box.fill_score_map(
            score_map=score_map,
            value=value,
            score_map_mask=self,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def to_score_map(self) -> 'ScoreMap':
        mat = self.np_mask.astype(np.float32)
        return ScoreMap(mat=mat, box=self.box)

    def extract_image(self, image: 'Image') -> 'Image':
        image = self.equivalent_box.extract_image(image)
        image = image.copy()
        self.to_inverted_mask().fill_image(image, value=0)
        return image

    def fill_image(
        self,
        image: 'Image',
        value: Union['Image', np.ndarray, Tuple[int, ...], int],
        alpha: Union['ScoreMap', np.ndarray, float] = 1.0,
    ):
        self.equivalent_box.fill_image(
            image=image,
            value=value,
            image_mask=self,
            alpha=alpha,
        )

    def to_external_box(self) -> 'Box':
        np_mask = self.np_mask
        np_vert_nonzero = np.nonzero(np.amax(np_mask, axis=1))[0]
        np_hori_nonzero = np.nonzero(np.amax(np_mask, axis=0))[0]
        if len(np_vert_nonzero) == 0 or len(np_hori_nonzero) == 0:
            raise RuntimeError('to_external_box: empty np_mask.')
        return Box(
            up=int(np_vert_nonzero[0]),
            down=int(np_vert_nonzero[-1]),
            left=int(np_hori_nonzero[0]),
            right=int(np_hori_nonzero[-1]),
        )

    def to_external_polygon(self) -> 'Polygon':
        polygons = self.to_disconnected_polygons()
        if not polygons:
            raise RuntimeError('Cannot find any contour.')
        if len(polygons) > 1:
            logger.warning('More than one polygon detected; keeping the largest.')
            return max(polygons, key=lambda polygon: polygon.area)
        return polygons[0]

    def to_disconnected_polygons(self) -> Sequence['Polygon']:
        """External contour of each 8-connected component.

        First-party replacement for cv.findContours at
        vkit/element/mask.py:657-733; traced contours are valid simple
        polygons by construction (no make_valid recovery needed).
        """
        contours = geometry.external_contours(self.np_mask.astype(np.uint8))
        polygons: List[Polygon] = []
        for np_points in contours:
            if np_points.shape[0] < 3:
                continue
            if self.box:
                np_points = np_points + np.array([self.box.left, self.box.up])
            polygons.append(Polygon.from_np_array(np_points.astype(np.int64)))
        return polygons

    def to_disconnected_polygon_mask_pairs(self) -> Sequence[Tuple['Polygon', 'Mask']]:
        pairs: List[Tuple[Polygon, Mask]] = []
        for polygon in self.to_disconnected_polygons():
            bounding_box = polygon.to_bounding_box()
            boxed_mask = Mask.from_shapable(bounding_box).to_box_attached(bounding_box)
            polygon.fill_mask(boxed_mask)
            pairs.append((polygon, boxed_mask))
        return pairs


def generate_fill_by_masks_mask(
    shape: Tuple[int, int],
    masks: Iterable[Mask],
    mode: ElementSetOperationMode,
):
    if mode == ElementSetOperationMode.UNION:
        return None
    return Mask.from_masks(shape, masks, mode)


# Cyclic imports at module bottom, by design.
from .uniqueness import check_elements_uniqueness  # noqa: E402
from .image import Image  # noqa: E402
from .box import Box, generate_fill_by_boxes_mask  # noqa: E402
from .polygon import Polygon, generate_fill_by_polygons_mask  # noqa: E402
from .score_map import ScoreMap  # noqa: E402
