"""Image element: uint8/float32 raster with mode-aware conversions.

Capability parity: vkit/element/image.py:34-898.  The cv2.cvtColor conversion
graph is replaced by first-party colorspace math
(vkit_tpu/ops/colorspace_np.py); cv2.resize by the tap-matrix resize.
"""
import os
from contextlib import ContextDecorator
from enum import Enum, unique
from typing import Iterable, List, Optional, Sequence, Tuple, TypeVar, Union

import attr
import numpy as np
from PIL import Image as PilImage
from PIL import ImageOps as PilImageOps

from ..ops import colorspace_np as csp
from ..ops.resize_taps import Interpolation, resize_np
from ..utility.type import PathType
from .opt import generate_resized_shape, generate_shape_and_resized_shape
from .type import ElementSetOperationMode, Shapable


@unique
class ImageMode(Enum):
    RGB = 'rgb'
    RGB_GCN = 'rgb_gcn'
    RGBA = 'rgba'
    HSV = 'hsv'
    HSV_GCN = 'hsv_gcn'
    HSL = 'hsl'
    HSL_GCN = 'hsl_gcn'
    GRAYSCALE = 'grayscale'
    GRAYSCALE_GCN = 'grayscale_gcn'
    NONE = 'none'

    def to_ndim(self) -> int:
        if self in _NDIM_3:
            return 3
        if self in _NDIM_2:
            return 2
        raise NotImplementedError()

    def to_dtype(self):
        if self in _DTYPE_UINT8:
            return np.uint8
        if self in _DTYPE_FLOAT32:
            return np.float32
        raise NotImplementedError()

    def to_num_channels(self) -> Optional[int]:
        if self is ImageMode.RGBA:
            return 4
        if self in _NDIM_3:
            return 3
        if self in _NDIM_2:
            return None
        raise NotImplementedError()

    def supports_gcn_mode(self) -> bool:
        return self in _NON_GCN_TO_GCN

    def to_gcn_mode(self) -> 'ImageMode':
        if not self.supports_gcn_mode():
            raise RuntimeError(f'image_mode={self} not supported.')
        return _NON_GCN_TO_GCN[self]

    def in_gcn_mode(self) -> bool:
        return self in _GCN_TO_NON_GCN

    def to_non_gcn_mode(self) -> 'ImageMode':
        if not self.in_gcn_mode():
            raise RuntimeError(f'image_mode={self} not in gcn mode.')
        return _GCN_TO_NON_GCN[self]


_NDIM_3 = {
    ImageMode.RGB, ImageMode.RGB_GCN, ImageMode.RGBA,
    ImageMode.HSV, ImageMode.HSV_GCN, ImageMode.HSL, ImageMode.HSL_GCN,
}
_NDIM_2 = {ImageMode.GRAYSCALE, ImageMode.GRAYSCALE_GCN}
_DTYPE_UINT8 = {
    ImageMode.RGB, ImageMode.RGBA, ImageMode.HSV, ImageMode.HSL, ImageMode.GRAYSCALE
}
_DTYPE_FLOAT32 = {
    ImageMode.RGB_GCN, ImageMode.HSV_GCN, ImageMode.HSL_GCN, ImageMode.GRAYSCALE_GCN
}
_NON_GCN_TO_GCN = {
    ImageMode.RGB: ImageMode.RGB_GCN,
    ImageMode.HSV: ImageMode.HSV_GCN,
    ImageMode.HSL: ImageMode.HSL_GCN,
    ImageMode.GRAYSCALE: ImageMode.GRAYSCALE_GCN,
}
_GCN_TO_NON_GCN = {val: key for key, val in _NON_GCN_TO_GCN.items()}

# mode -> RGB converters (first-party; vkit_tpu/ops/colorspace_np.py).
_TO_RGB = {
    ImageMode.GRAYSCALE: csp.gray_to_rgb,
    ImageMode.RGBA: csp.rgba_to_rgb,
    ImageMode.HSV: csp.hsv_full_to_rgb,
    ImageMode.HSL: csp.hsl_full_to_rgb,
}
_FROM_RGB = {
    ImageMode.GRAYSCALE: csp.rgb_to_gray,
    ImageMode.RGBA: csp.rgb_to_rgba,
    ImageMode.HSV: csp.rgb_to_hsv_full,
    ImageMode.HSL: csp.rgb_to_hsl_full,
}

_E = TypeVar('_E', 'Box', 'Polygon', 'Mask', 'ScoreMap')


@attr.define
class ImageSetItemConfig:
    value: Union['Image', np.ndarray, Tuple[int, ...], int]
    alpha: Union['ScoreMap', np.ndarray, float] = 1.0


class WritableImageContextDecorator(ContextDecorator):

    def __init__(self, image: 'Image'):
        super().__init__()
        self.image = image

    def __enter__(self):
        try:
            self.image.mat.flags.writeable = True
        except ValueError:
            object.__setattr__(self.image, 'mat', np.array(self.image.mat))
            assert self.image.mat.flags.writeable

    def __exit__(self, *exc):
        self.image.mat.flags.writeable = False


@attr.define(frozen=True, eq=False)
class Image(Shapable):
    mat: np.ndarray
    mode: ImageMode = ImageMode.NONE
    box: Optional['Box'] = None

    def __attrs_post_init__(self):
        if self.mode != ImageMode.NONE:
            assert self.mode.to_dtype() == self.mat.dtype
            assert self.mode.to_ndim() == self.mat.ndim
        else:
            if self.mat.dtype == np.uint8:
                if self.mat.ndim == 2:
                    mode = ImageMode.GRAYSCALE
                elif self.mat.ndim == 3:
                    if self.mat.shape[2] == 4:
                        mode = ImageMode.RGBA
                    elif self.mat.shape[2] == 3:
                        mode = ImageMode.RGB
                    else:
                        raise NotImplementedError(
                            f'Invalid num_channels={self.mat.shape[2]}.'
                        )
                else:
                    raise NotImplementedError(f'mat.ndim={self.mat.ndim} not supported.')
                object.__setattr__(self, 'mode', mode)
            else:
                raise NotImplementedError(f'Invalid mat.dtype={self.mat.dtype}.')

        self.mat.flags.writeable = False

        if self.box and self.shape != self.box.shape:
            raise RuntimeError('self.shape != box.shape.')

    ###############
    # Constructor #
    ###############
    @classmethod
    def from_shape(
        cls,
        shape: Tuple[int, int],
        num_channels: int = 3,
        value: Union[Tuple[int, ...], int] = 255,
    ) -> 'Image':
        height, width = shape
        if num_channels == 0:
            mat = np.full((height, width), fill_value=value, dtype=np.uint8)
        else:
            assert num_channels > 0
            if isinstance(value, tuple):
                assert len(value) == num_channels
            mat = np.full((height, width, num_channels), fill_value=value, dtype=np.uint8)
        return cls(mat=mat)

    @classmethod
    def from_shapable(
        cls,
        shapable: Shapable,
        num_channels: int = 3,
        value: Union[Tuple[int, ...], int] = 255,
    ) -> 'Image':
        return cls.from_shape(
            shape=shapable.shape, num_channels=num_channels, value=value
        )

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
    def num_channels(self) -> int:
        if self.mat.ndim == 2:
            return 0
        assert self.mat.ndim == 3
        return self.mat.shape[2]

    @property
    def equivalent_box(self) -> 'Box':
        return self.box or Box.from_shapable(self)

    @property
    def writable_context(self):
        return WritableImageContextDecorator(self)

    ##############
    # Conversion #
    ##############
    @classmethod
    def from_pil_image(cls, pil_image: PilImage.Image) -> 'Image':
        mat = np.array(pil_image, dtype=np.uint8)
        return cls(mat=mat)

    def to_pil_image(self) -> PilImage.Image:
        return PilImage.fromarray(self.mat)

    @classmethod
    def from_file(cls, path: PathType, disable_exif_orientation: bool = False) -> 'Image':
        path = os.path.expanduser(os.path.expandvars(os.fspath(path)))
        pil_image = PilImage.open(path)
        pil_image.load()
        if not disable_exif_orientation:
            if pil_image.getexif().get(0x0112):
                pil_image = PilImageOps.exif_transpose(pil_image)
        return cls.from_pil_image(pil_image)

    def to_file(self, path: PathType, disable_to_rgb_image: bool = False):
        image = self
        if not disable_to_rgb_image:
            image = image.to_rgb_image()
        path = os.path.expanduser(os.path.expandvars(os.fspath(path)))
        image.to_pil_image().save(path)

    ############
    # Operator #
    ############
    def copy(self) -> 'Image':
        return attr.evolve(self, mat=self.mat.copy())

    def assign_mat(self, mat: np.ndarray):
        with self.writable_context:
            object.__setattr__(self, 'mat', mat)

    @classmethod
    def unpack_element_value_tuples(cls, element_value_tuples):
        elements: List = []
        values: List = []
        alphas: List = []
        for element_value_tuple in element_value_tuples:
            if len(element_value_tuple) == 2:
                element, value = element_value_tuple
                alpha = 1.0
            else:
                element, value, alpha = element_value_tuple
            elements.append(element)
            values.append(value)
            alphas.append(alpha)
        return elements, values, alphas

    @classmethod
    def check_values_and_alphas_uniqueness(cls, values, alphas) -> bool:
        return check_elements_uniqueness(values) and check_elements_uniqueness(alphas)

    def fill_by_box_value_tuples(
        self,
        box_value_tuples,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        skip_values_uniqueness_check: bool = False,
    ):
        boxes, values, alphas = self.unpack_element_value_tuples(box_value_tuples)

        boxes_mask = generate_fill_by_boxes_mask(self.shape, boxes, mode)
        if boxes_mask is None:
            for box, value, alpha in zip(boxes, values, alphas):
                box.fill_image(image=self, value=value, alpha=alpha)
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = self.check_values_and_alphas_uniqueness(values, alphas)

        if unique:
            boxes_mask.fill_image(image=self, value=values[0], alpha=alphas[0])
        else:
            for box, value, alpha in zip(boxes, values, alphas):
                box_mask = box.extract_mask(boxes_mask).to_box_attached(box)
                box_mask.fill_image(image=self, value=value, alpha=alpha)

    def fill_by_boxes(
        self,
        boxes: Iterable['Box'],
        value: Union['Image', np.ndarray, Tuple[int, ...], int],
        alpha: Union[np.ndarray, float] = 1.0,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
    ):
        self.fill_by_box_value_tuples(
            box_value_tuples=((box, value, alpha) for box in boxes),
            mode=mode,
            skip_values_uniqueness_check=True,
        )

    def fill_by_polygon_value_tuples(
        self,
        polygon_value_tuples,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        skip_values_uniqueness_check: bool = False,
    ):
        polygons, values, alphas = self.unpack_element_value_tuples(polygon_value_tuples)

        polygons_mask = generate_fill_by_polygons_mask(self.shape, polygons, mode)
        if polygons_mask is None:
            for polygon, value, alpha in zip(polygons, values, alphas):
                polygon.fill_image(image=self, value=value, alpha=alpha)
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = self.check_values_and_alphas_uniqueness(values, alphas)

        if unique:
            polygons_mask.fill_image(image=self, value=values[0], alpha=alphas[0])
        else:
            for polygon, value, alpha in zip(polygons, values, alphas):
                bounding_box = polygon.to_bounding_box()
                polygon_mask = bounding_box.extract_mask(polygons_mask)
                polygon_mask = polygon_mask.to_box_attached(bounding_box)
                polygon_mask.fill_image(image=self, value=value, alpha=alpha)

    def fill_by_polygons(
        self,
        polygons: Iterable['Polygon'],
        value: Union['Image', np.ndarray, Tuple[int, ...], int],
        alpha: Union[np.ndarray, float] = 1.0,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
    ):
        self.fill_by_polygon_value_tuples(
            polygon_value_tuples=((polygon, value, alpha) for polygon in polygons),
            mode=mode,
            skip_values_uniqueness_check=True,
        )

    def fill_by_mask_value_tuples(
        self,
        mask_value_tuples,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        skip_values_uniqueness_check: bool = False,
    ):
        masks, values, alphas = self.unpack_element_value_tuples(mask_value_tuples)

        masks_mask = generate_fill_by_masks_mask(self.shape, masks, mode)
        if masks_mask is None:
            for mask, value, alpha in zip(masks, values, alphas):
                mask.fill_image(image=self, value=value, alpha=alpha)
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = self.check_values_and_alphas_uniqueness(values, alphas)

        if unique:
            masks_mask.fill_image(image=self, value=values[0], alpha=alphas[0])
        else:
            for mask, value, alpha in zip(masks, values, alphas):
                if mask.box:
                    boxed_mask = mask.box.extract_mask(masks_mask)
                else:
                    boxed_mask = masks_mask
                boxed_mask = boxed_mask.copy()
                mask.to_inverted_mask().fill_mask(boxed_mask, value=0)
                boxed_mask.fill_image(image=self, value=value, alpha=alpha)

    def fill_by_masks(
        self,
        masks: Iterable['Mask'],
        value: Union['Image', np.ndarray, Tuple[int, ...], int],
        alpha: Union[np.ndarray, float] = 1.0,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
    ):
        self.fill_by_mask_value_tuples(
            mask_value_tuples=((mask, value, alpha) for mask in masks),
            mode=mode,
            skip_values_uniqueness_check=True,
        )

    def fill_by_score_map_value_tuples(
        self,
        score_map_value_tuples,
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
        skip_values_uniqueness_check: bool = False,
    ):
        # Score maps serve as both masks and alphas.
        score_maps, values, _ = self.unpack_element_value_tuples(score_map_value_tuples)

        score_maps_mask = generate_fill_by_score_maps_mask(self.shape, score_maps, mode)
        if score_maps_mask is None:
            for score_map, value in zip(score_maps, values):
                score_map.fill_image(image=self, value=value)
            return

        unique = True
        if not skip_values_uniqueness_check:
            unique = check_elements_uniqueness(values)

        if unique:
            score_maps_mask.fill_image(image=self, value=values[0], alpha=score_maps[0])
        else:
            for score_map, value in zip(score_maps, values):
                if score_map.box:
                    boxed_mask = score_map.box.extract_mask(score_maps_mask)
                else:
                    boxed_mask = score_maps_mask
                boxed_mask = boxed_mask.copy()
                score_map.to_mask().to_inverted_mask().fill_mask(boxed_mask, value=0)
                boxed_mask.fill_image(image=self, value=value, alpha=score_map)

    def fill_by_score_maps(
        self,
        score_maps: Iterable['ScoreMap'],
        value: Union['Image', np.ndarray, Tuple[int, ...], int],
        mode: ElementSetOperationMode = ElementSetOperationMode.UNION,
    ):
        self.fill_by_score_map_value_tuples(
            score_map_value_tuples=((score_map, value) for score_map in score_maps),
            mode=mode,
            skip_values_uniqueness_check=True,
        )

    def __setitem__(
        self,
        element: Union['Box', 'Polygon', 'Mask', 'ScoreMap'],
        config: Union['Image', np.ndarray, Tuple[int, ...], int, ImageSetItemConfig],
    ):
        if not isinstance(config, ImageSetItemConfig):
            value = config
            alpha = 1.0
        else:
            value = config.value
            alpha = config.alpha

        if isinstance(element, ScoreMap):
            element.fill_image(image=self, value=value)
        elif isinstance(element, (Box, Polygon, Mask)):
            element.fill_image(image=self, value=value, alpha=alpha)
        else:
            raise NotImplementedError()

    def __getitem__(self, element: Union['Box', 'Polygon', 'Mask']) -> 'Image':
        return element.extract_image(self)

    def to_box_attached(self, box: 'Box') -> 'Image':
        assert self.shape == box.shape
        return attr.evolve(self, box=box)

    def to_box_detached(self) -> 'Image':
        assert self.box
        return attr.evolve(self, box=None)

    def to_gcn_image(
        self,
        lamb: float = 0,
        eps: float = 1E-8,
        scale: float = 1.0,
    ) -> 'Image':
        # Global contrast normalization (vkit/element/image.py:733-757).
        mode = self.mode.to_gcn_mode()
        mat = self.mat.astype(np.float32)
        mat -= np.mean(mat)
        std = np.sqrt(lamb + np.mean(mat**2))
        mat /= max(eps, std)
        if scale != 1.0:
            mat *= scale
        return Image(mat=mat, mode=mode)

    def to_non_gcn_image(self) -> 'Image':
        mode = self.mode.to_non_gcn_mode()
        assert self.mat.dtype == np.float32
        mat = self.mat - np.min(self.mat)
        gap = np.max(mat)
        mat = mat / max(gap, 1e-8) * 255.0
        mat = np.clip(np.round(mat), 0, 255).astype(np.uint8)
        return Image(mat=mat, mode=mode)

    def to_target_mode_image(self, target_mode: ImageMode) -> 'Image':
        if target_mode == self.mode:
            return self

        image = self
        skip_copy = False
        if image.mode.in_gcn_mode():
            image = image.to_non_gcn_image()
            skip_copy = True

        if image.mode == target_mode:
            return image if skip_copy else image.copy()

        mat = image.mat
        if image.mode != ImageMode.RGB:
            mat = _TO_RGB[image.mode](mat)
        if target_mode == ImageMode.RGB:
            return Image(mat=mat, mode=ImageMode.RGB)
        mat = _FROM_RGB[target_mode](mat)
        return Image(mat=mat, mode=target_mode)

    def to_grayscale_image(self) -> 'Image':
        return self.to_target_mode_image(ImageMode.GRAYSCALE)

    def to_rgb_image(self) -> 'Image':
        return self.to_target_mode_image(ImageMode.RGB)

    def to_rgba_image(self) -> 'Image':
        return self.to_target_mode_image(ImageMode.RGBA)

    def to_hsv_image(self) -> 'Image':
        return self.to_target_mode_image(ImageMode.HSV)

    def to_hsl_image(self) -> 'Image':
        return self.to_target_mode_image(ImageMode.HSL)

    def to_shifted_image(self, offset_y: int = 0, offset_x: int = 0) -> 'Image':
        assert self.box
        shifted_box = self.box.to_shifted_box(offset_y=offset_y, offset_x=offset_x)
        return attr.evolve(self, box=shifted_box)

    def to_resized_image(
        self,
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
        interpolation: Interpolation = Interpolation.CUBIC,
    ) -> 'Image':
        _, _, resized_height, resized_width = generate_shape_and_resized_shape(
            shapable_or_shape=self,
            resized_height=resized_height,
            resized_width=resized_width,
        )
        mat = resize_np(self.mat, (resized_height, resized_width), interpolation)
        return attr.evolve(self, mat=mat)

    def to_conducted_resized_image(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
        interpolation: Interpolation = Interpolation.CUBIC,
    ) -> 'Image':
        assert self.box
        resized_box = self.box.to_conducted_resized_box(
            shapable_or_shape=shapable_or_shape,
            resized_height=resized_height,
            resized_width=resized_width,
        )
        resized_image = self.to_box_detached().to_resized_image(
            resized_height=resized_box.height,
            resized_width=resized_box.width,
            interpolation=interpolation,
        )
        return resized_image.to_box_attached(resized_box)

    def to_cropped_image(
        self,
        up: Optional[int] = None,
        down: Optional[int] = None,
        left: Optional[int] = None,
        right: Optional[int] = None,
    ) -> 'Image':
        assert not self.box
        up = up or 0
        down = down or self.height - 1
        left = left or 0
        right = right or self.width - 1
        return attr.evolve(self, mat=self.mat[up:down + 1, left:right + 1])


# Cyclic imports at module bottom, by design.
from .uniqueness import check_elements_uniqueness  # noqa: E402
from .box import Box, generate_fill_by_boxes_mask  # noqa: E402
from .polygon import Polygon, generate_fill_by_polygons_mask  # noqa: E402
from .mask import Mask, generate_fill_by_masks_mask  # noqa: E402
from .score_map import ScoreMap, generate_fill_by_score_maps_mask  # noqa: E402
