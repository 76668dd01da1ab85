"""Polygon element: point tuple + lazy raster internals + offset/union ops.

Capability parity: vkit/element/polygon.py:39-721.  GEOS/pyclipper calls are
replaced by the first-party geometry backend (vkit_tpu/geometry): shoelace
area/centroid, rotating-calipers min rotated rectangle, EDT-based offsets
(Vatti equivalent) and raster-space unions (make_valid subsumed by
construction).
"""
import logging
import math
from typing import Iterable, List, Optional, Sequence, Tuple, Union

import attr
import numpy as np

from .. import geometry
from .type import ElementSetOperationMode, Shapable

logger = logging.getLogger(__name__)

_V = Union[float, int, str]


@attr.define
class PolygonInternals:
    bounding_box: 'Box'
    np_self_relative_points: np.ndarray  # (P, 2) float32 xy, relative to bounding box.

    _area: Optional[float] = None
    _self_relative_polygon: Optional['Polygon'] = None
    _np_mask: Optional[np.ndarray] = None
    _mask: Optional['Mask'] = None

    @property
    def area(self) -> float:
        if self._area is None:
            self._area = geometry.polygon_area(
                self.np_self_relative_points.astype(np.float64)
            )
        return self._area

    @property
    def self_relative_polygon(self) -> 'Polygon':
        if self._self_relative_polygon is None:
            self._self_relative_polygon = Polygon.from_xy_pairs(
                self.np_self_relative_points.tolist()
            )
        return self._self_relative_polygon

    @property
    def np_mask(self) -> np.ndarray:
        if self._np_mask is None:
            self._np_mask = geometry.fill_poly(
                self.np_self_relative_points.astype(np.float64),
                self.bounding_box.shape,
            ).astype(bool)
        return self._np_mask

    @property
    def mask(self) -> 'Mask':
        if self._mask is None:
            mask = Mask(mat=self.np_mask.astype(np.uint8))
            self._mask = mask.to_box_attached(self.bounding_box)
        return self._mask


@attr.define(frozen=True, eq=False)
class Polygon:
    points: 'PointTuple'
    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    def __attrs_post_init__(self):
        assert len(self.points) >= 3

    def __eq__(self, other: object):
        if not isinstance(other, Polygon):
            return NotImplemented
        return self.points == other.points

    @property
    def num_points(self) -> int:
        return len(self.points)

    @property
    def internals(self) -> PolygonInternals:
        internals = self._cache.get('internals')
        if internals is None:
            # Matches vkit/element/polygon.py:105-135: bounding box from the
            # rounded smooth extrema; relative points shifted by the raw mins.
            np_smooth = self.to_smooth_np_array().astype(np.float64)
            x_min = float(np_smooth[:, 0].min())
            y_min = float(np_smooth[:, 1].min())
            x_max = float(np_smooth[:, 0].max())
            y_max = float(np_smooth[:, 1].max())
            bounding_box = Box(
                up=round(y_min),
                down=round(y_max),
                left=round(x_min),
                right=round(x_max),
            )
            np_rel = (np_smooth - np.array([x_min, y_min])).astype(np.float32)
            internals = PolygonInternals(
                bounding_box=bounding_box,
                np_self_relative_points=np_rel,
            )
            self._cache['internals'] = internals
        return internals

    @property
    def area(self) -> float:
        return self.internals.area

    @property
    def bounding_box(self) -> 'Box':
        return self.internals.bounding_box

    @property
    def self_relative_polygon(self) -> 'Polygon':
        return self.internals.self_relative_polygon

    @property
    def mask(self) -> 'Mask':
        return self.internals.mask

    ###############
    # Constructor #
    ###############
    @classmethod
    def create(cls, points: Union['PointList', 'PointTuple', Iterable['Point']]) -> 'Polygon':
        return cls(points=PointTuple(points))

    @classmethod
    def from_xy_pairs(cls, xy_pairs: Iterable[Tuple[_V, _V]]) -> 'Polygon':
        return cls(points=PointTuple.from_xy_pairs(xy_pairs))

    @classmethod
    def from_flatten_xy_pairs(cls, flatten_xy_pairs: Sequence[_V]) -> 'Polygon':
        return cls(points=PointTuple.from_flatten_xy_pairs(flatten_xy_pairs))

    @classmethod
    def from_np_array(cls, np_points: np.ndarray) -> 'Polygon':
        return cls(points=PointTuple.from_np_array(np_points))

    ##############
    # Conversion #
    ##############
    def to_xy_pairs(self):
        return self.points.to_xy_pairs()

    def to_smooth_xy_pairs(self):
        return self.points.to_smooth_xy_pairs()

    def to_flatten_xy_pairs(self):
        return self.points.to_flatten_xy_pairs()

    def to_smooth_flatten_xy_pairs(self):
        return self.points.to_smooth_flatten_xy_pairs()

    def to_np_array(self) -> np.ndarray:
        return self.points.to_np_array()

    def to_smooth_np_array(self) -> np.ndarray:
        return self.points.to_smooth_np_array()

    ############
    # Operator #
    ############
    def get_center_point(self) -> 'Point':
        cx, cy = geometry.polygon_centroid(self.to_smooth_np_array().astype(np.float64))
        return Point.create(y=cy, x=cx)

    def get_rectangular_height(self) -> float:
        # Relies on the Box.to_polygon corner ordering contract.
        assert self.num_points == 4
        p_ul, p_ur, p_dr, p_dl = self.points
        left = math.hypot(p_ul.smooth_y - p_dl.smooth_y, p_ul.smooth_x - p_dl.smooth_x)
        right = math.hypot(p_ur.smooth_y - p_dr.smooth_y, p_ur.smooth_x - p_dr.smooth_x)
        return (left + right) / 2

    def get_rectangular_width(self) -> float:
        assert self.num_points == 4
        p_ul, p_ur, p_dr, p_dl = self.points
        up = math.hypot(p_ul.smooth_y - p_ur.smooth_y, p_ul.smooth_x - p_ur.smooth_x)
        down = math.hypot(p_dl.smooth_y - p_dr.smooth_y, p_dl.smooth_x - p_dr.smooth_x)
        return (up + down) / 2

    def to_clipped_points(self, shapable_or_shape: Union[Shapable, Tuple[int, int]]):
        return self.points.to_clipped_points(shapable_or_shape)

    def to_clipped_polygon(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
    ) -> 'Polygon':
        return Polygon(points=PointTuple(self.to_clipped_points(shapable_or_shape)))

    def to_shifted_points(self, offset_y: int = 0, offset_x: int = 0):
        return self.points.to_shifted_points(offset_y=offset_y, offset_x=offset_x)

    def to_relative_points(self, origin_y: int, origin_x: int):
        return self.points.to_relative_points(origin_y=origin_y, origin_x=origin_x)

    def to_shifted_polygon(self, offset_y: int = 0, offset_x: int = 0) -> 'Polygon':
        return Polygon(
            points=PointTuple(self.to_shifted_points(offset_y=offset_y, offset_x=offset_x))
        )

    def to_relative_polygon(self, origin_y: int, origin_x: int) -> 'Polygon':
        return self.to_shifted_polygon(offset_y=-origin_y, offset_x=-origin_x)

    def to_conducted_resized_polygon(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ) -> 'Polygon':
        return Polygon(
            points=PointTuple(
                self.points.to_conducted_resized_points(
                    shapable_or_shape=shapable_or_shape,
                    resized_height=resized_height,
                    resized_width=resized_width,
                )
            )
        )

    def to_resized_polygon(
        self,
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ) -> 'Polygon':
        return self.to_conducted_resized_polygon(
            shapable_or_shape=self.bounding_box.shape,
            resized_height=resized_height,
            resized_width=resized_width,
        )

    @classmethod
    def project_polygon_to_unit_vector(cls, np_points: np.ndarray, radian: float):
        np_vector = np.asarray([math.cos(radian), math.sin(radian)])
        np_projected = np.dot(np_points, np_vector.reshape(2, 1)).flatten()
        np_point_begin = np_vector * float(np_projected.min())
        np_point_end = np_vector * float(np_projected.max())
        return np_point_begin, np_point_end

    @classmethod
    def calculate_lines_intersection_point(
        cls,
        np_point0: np.ndarray,
        radian0: float,
        np_point1: np.ndarray,
        radian1: float,
    ) -> 'Point':
        x0, y0 = np_point0
        x1, y1 = np_point1
        slope0 = np.tan(radian0)
        slope1 = np.tan(radian1)
        # tan(pi/2 +- 0.1 deg).
        invalid_slope_abs = 572.9572133543033

        if abs(slope0) > invalid_slope_abs and abs(slope1) > invalid_slope_abs:
            raise RuntimeError('Lines are vertical.')
        if abs(slope0) > invalid_slope_abs:
            its_x = float(x0)
            its_y = float(y1 + slope1 * (x0 - x1))
        elif abs(slope1) > invalid_slope_abs:
            its_x = float(x1)
            its_y = float(y0 + slope0 * (x1 - x0))
        else:
            c0 = y0 - slope0 * x0
            c1 = y1 - slope1 * x1
            with np.errstate(divide='ignore', invalid='ignore'):
                its_x = (c1 - c0) / (slope0 - slope1)
            if not np.isfinite(its_x):
                raise RuntimeError('Lines not intersected.')
            its_y = slope0 * its_x + c0
        return Point.create(y=float(its_y), x=float(its_x))

    def to_bounding_rectangular_polygon(
        self,
        shape: Tuple[int, int],
        angle: Optional[float] = None,
    ) -> 'Polygon':
        if angle is None:
            corners = geometry.min_area_rect(
                self.to_smooth_np_array().astype(np.float64)
            )
            polygon = Polygon.from_xy_pairs(corners.tolist())
        else:
            angle = angle % 180
            main_radian = math.radians(angle)
            orthogonal_radian = math.radians(angle + 90)
            np_smooth_points = self.to_smooth_np_array()
            np_mb, np_me = self.project_polygon_to_unit_vector(np_smooth_points, main_radian)
            np_ob, np_oe = self.project_polygon_to_unit_vector(
                np_smooth_points, orthogonal_radian
            )
            polygon = Polygon.create(
                points=[
                    self.calculate_lines_intersection_point(
                        np_mb, orthogonal_radian, np_ob, main_radian
                    ),
                    self.calculate_lines_intersection_point(
                        np_mb, orthogonal_radian, np_oe, main_radian
                    ),
                    self.calculate_lines_intersection_point(
                        np_me, orthogonal_radian, np_oe, main_radian
                    ),
                    self.calculate_lines_intersection_point(
                        np_me, orthogonal_radian, np_ob, main_radian
                    ),
                ]
            )
        return polygon.to_clipped_polygon(shape)

    def to_bounding_box(self) -> 'Box':
        return self.bounding_box

    #####################
    # Fill and extract. #
    #####################
    def fill_np_array(
        self,
        mat: np.ndarray,
        value: Union[np.ndarray, Tuple[float, ...], float],
        alpha: Union['ScoreMap', np.ndarray, float] = 1.0,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.bounding_box.fill_np_array(
            mat=mat,
            value=value,
            np_mask=self.internals.np_mask,
            alpha=alpha,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def extract_mask(self, mask: 'Mask') -> 'Mask':
        return self.internals.mask.extract_mask(mask)

    def fill_mask(
        self,
        mask: 'Mask',
        value: Union['Mask', np.ndarray, int] = 1,
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.internals.mask.fill_mask(
            mask=mask,
            value=value,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def extract_score_map(self, score_map: 'ScoreMap') -> 'ScoreMap':
        return self.internals.mask.extract_score_map(score_map)

    def fill_score_map(
        self,
        score_map: 'ScoreMap',
        value: Union['ScoreMap', np.ndarray, float],
        keep_max_value: bool = False,
        keep_min_value: bool = False,
    ):
        self.internals.mask.fill_score_map(
            score_map=score_map,
            value=value,
            keep_max_value=keep_max_value,
            keep_min_value=keep_min_value,
        )

    def extract_image(self, image: 'Image') -> 'Image':
        return self.internals.mask.extract_image(image)

    def fill_image(
        self,
        image: 'Image',
        value: Union['Image', np.ndarray, Tuple[int, ...], int],
        alpha: Union[np.ndarray, float] = 1.0,
    ):
        self.internals.mask.fill_image(image=image, value=value, alpha=alpha)

    ##############################
    # Offsetting (Vatti equiv.). #
    ##############################
    @classmethod
    def remove_duplicated_xy_pairs(cls, xy_pairs: Sequence[Tuple[int, int]]):
        xy_pairs = tuple(map(tuple, xy_pairs))
        unique: List[Tuple[int, int]] = []
        idx = 0
        while idx < len(xy_pairs):
            unique.append(xy_pairs[idx])  # type: ignore[arg-type]
            next_idx = idx + 1
            while next_idx < len(xy_pairs) and xy_pairs[idx] == xy_pairs[next_idx]:
                next_idx += 1
            idx = next_idx
        if len(unique) > 1 and unique[0] == unique[-1]:
            unique.pop()
        assert len(unique) >= 3
        return unique

    def to_vatti_clipped_polygon(self, ratio: float, shrink: bool):
        """Offset by ``d = area * (1 - ratio^2) / perimeter`` (DBNet-style),
        matching vkit/element/polygon.py:525-550."""
        assert 0.0 <= ratio <= 1.0
        if ratio == 1.0:
            return self, 0.0

        np_points = np.asarray(self.to_smooth_xy_pairs(), dtype=np.float64)
        area = geometry.polygon_area(np_points)
        perimeter = geometry.polygon_perimeter(np_points)
        if area == 0:
            logger.warning('polygon area == 0, this breaks vatti_clip.')
        distance: float = area * (1 - np.power(ratio, 2)) / max(perimeter, 1e-6)
        if shrink:
            distance *= -1

        clipped = geometry.offset_polygon(np_points, distance)
        assert clipped
        # Largest output piece, as clipper's Execute()[0].
        clipped.sort(key=geometry.polygon_area, reverse=True)
        xy_pairs = [(round(x), round(y)) for x, y in clipped[0]]
        clipped_polygon = Polygon.from_xy_pairs(self.remove_duplicated_xy_pairs(xy_pairs))
        return clipped_polygon, distance

    def to_shrank_polygon(self, ratio: float, no_exception: bool = True) -> 'Polygon':
        try:
            shrank_polygon, _ = self.to_vatti_clipped_polygon(ratio, shrink=True)

            shrank_bb = shrank_polygon.bounding_box
            contains = (
                self.bounding_box.up <= shrank_bb.up
                and shrank_bb.down <= self.bounding_box.down
                and self.bounding_box.left <= shrank_bb.left
                and shrank_bb.right <= self.bounding_box.right
            )
            if not (shrank_bb.valid and contains):
                logger.warning('Invalid shrank_polygon bounding box. Fallback to NOP.')
                return self
            if 0 < shrank_polygon.area <= self.area:
                return shrank_polygon
            logger.warning('Invalid shrank_polygon.area. Fallback to NOP.')
            return self
        except Exception:
            if no_exception:
                logger.exception('Failed to shrink. Fallback to NOP.')
                return self
            raise

    def to_dilated_polygon(self, ratio: float, no_exception: bool = True) -> 'Polygon':
        try:
            dilated_polygon, _ = self.to_vatti_clipped_polygon(ratio, shrink=False)

            dilated_bb = dilated_polygon.bounding_box
            contains = (
                dilated_bb.up <= self.bounding_box.up
                and self.bounding_box.down <= dilated_bb.down
                and dilated_bb.left <= self.bounding_box.left
                and self.bounding_box.right <= dilated_bb.right
            )
            if not (dilated_bb.valid and contains):
                logger.warning('Invalid dilated_polygon bounding box. Fallback to NOP.')
                return self
            if dilated_polygon.area >= self.area:
                return dilated_polygon
            logger.warning('Invalid dilated_polygon.area. Fallback to NOP.')
            return self
        except Exception:
            if no_exception:
                logger.exception('Failed to dilate. Fallback to NOP.')
                return self
            raise


def estimate_polygon_height(np_points: np.ndarray) -> float:
    """area / longest edge — vkit/element/polygon.py:623-634."""
    closed = np.vstack([np_points, np_points[:1]])
    lengths = np.hypot(*(np.diff(closed, axis=0).T))
    return geometry.polygon_area(np_points) / max(float(lengths.max()), 1e-6)


def unionize_polygons(polygons: Iterable[Polygon]):
    """Merge overlapping polygons; returns (unionized, scatter_indices).

    Capability parity: vkit/element/polygon.py:656-701 — raster-space union
    replaces GEOS unary_union + buffer patching (valid by construction).
    """
    polygons = tuple(polygons)
    np_polys = [polygon.to_smooth_np_array().astype(np.float64) for polygon in polygons]
    merged, scatter_indices = geometry.unionize_polygons_raster(np_polys)
    unionized_polygons = [Polygon.from_xy_pairs(m.tolist()) for m in merged]
    return unionized_polygons, scatter_indices


def generate_fill_by_polygons_mask(
    shape: Tuple[int, int],
    polygons: Iterable[Polygon],
    mode: ElementSetOperationMode,
):
    if mode == ElementSetOperationMode.UNION:
        return None
    return Mask.from_polygons(shape, polygons, mode)


# Cyclic imports at module bottom, by design.
from .point import Point, PointList, PointTuple  # noqa: E402
from .box import Box  # noqa: E402
from .mask import Mask  # noqa: E402
from .score_map import ScoreMap  # noqa: E402
from .image import Image  # noqa: E402
