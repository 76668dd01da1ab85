"""Point / PointList / PointTuple.

Capability parity: vkit/element/point.py:32-283.  ``smooth_y``/``smooth_x``
carry sub-pixel positions through geometric distortion chains; equality and
hashing use the rounded integer coordinates only.
"""
from typing import Iterable, List, Optional, Sequence, Tuple, Union

import attr
import numpy as np

from .opt import (
    clip_val,
    extract_shape_from_shapable_or_shape,
    generate_shape_and_resized_shape,
    resize_val,
)
from .type import Shapable

_V = Union[float, int, str]


@attr.define(frozen=True, eq=False)
class Point:
    smooth_y: float
    smooth_x: float

    @property
    def y(self) -> int:
        return round(self.smooth_y)

    @property
    def x(self) -> int:
        return round(self.smooth_x)

    def __eq__(self, other: object):
        if not isinstance(other, Point):
            return NotImplemented
        return self.y == other.y and self.x == other.x

    def __hash__(self):
        return hash((self.y, self.x))

    @classmethod
    def create(cls, y: _V, x: _V) -> 'Point':
        return cls(smooth_y=float(y), smooth_x=float(x))

    @classmethod
    def from_xy_pair(cls, xy_pair: Tuple[_V, _V]) -> 'Point':
        x, y = xy_pair
        return cls.create(y=y, x=x)

    def to_xy_pair(self) -> Tuple[int, int]:
        return (self.x, self.y)

    def to_smooth_xy_pair(self) -> Tuple[float, float]:
        return (self.smooth_x, self.smooth_y)

    def to_clipped_point(self, shapable_or_shape: Union[Shapable, Tuple[int, int]]) -> 'Point':
        height, width = extract_shape_from_shapable_or_shape(shapable_or_shape)
        if 0 <= self.y < height and 0 <= self.x < width:
            return self
        return Point.create(
            y=clip_val(self.smooth_y, height),
            x=clip_val(self.smooth_x, width),
        )

    def to_shifted_point(self, offset_y: int = 0, offset_x: int = 0) -> 'Point':
        return Point.create(y=self.smooth_y + offset_y, x=self.smooth_x + offset_x)

    def to_relative_point(self, origin_y: int, origin_x: int) -> 'Point':
        return self.to_shifted_point(offset_y=-origin_y, offset_x=-origin_x)

    def to_conducted_resized_point(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ) -> 'Point':
        height, width, resized_height, resized_width = generate_shape_and_resized_shape(
            shapable_or_shape=shapable_or_shape,
            resized_height=resized_height,
            resized_width=resized_width,
        )
        return Point.create(
            y=resize_val(self.smooth_y, height, resized_height),
            x=resize_val(self.smooth_x, width, resized_width),
        )


class _PointsMixin:

    def to_xy_pairs(self):
        return [point.to_xy_pair() for point in self]  # type: ignore[attr-defined]

    def to_smooth_xy_pairs(self):
        return [point.to_smooth_xy_pair() for point in self]  # type: ignore[attr-defined]

    def to_flatten_xy_pairs(self):
        out: List[int] = []
        for point in self:  # type: ignore[attr-defined]
            out.extend(point.to_xy_pair())
        return out

    def to_smooth_flatten_xy_pairs(self):
        out: List[float] = []
        for point in self:  # type: ignore[attr-defined]
            out.extend(point.to_smooth_xy_pair())
        return out

    def to_np_array(self) -> np.ndarray:
        return np.asarray(self.to_xy_pairs(), dtype=np.int32)

    def to_smooth_np_array(self) -> np.ndarray:
        return np.asarray(self.to_smooth_xy_pairs(), dtype=np.float32)

    def to_clipped_points(self, shapable_or_shape: Union[Shapable, Tuple[int, int]]):
        return PointList(
            point.to_clipped_point(shapable_or_shape)
            for point in self  # type: ignore[attr-defined]
        )

    def to_shifted_points(self, offset_y: int = 0, offset_x: int = 0):
        return PointList(
            point.to_shifted_point(offset_y=offset_y, offset_x=offset_x)
            for point in self  # type: ignore[attr-defined]
        )

    def to_relative_points(self, origin_y: int, origin_x: int):
        return self.to_shifted_points(offset_y=-origin_y, offset_x=-origin_x)

    def to_conducted_resized_points(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ):
        return PointList(
            point.to_conducted_resized_point(
                shapable_or_shape=shapable_or_shape,
                resized_height=resized_height,
                resized_width=resized_width,
            ) for point in self  # type: ignore[attr-defined]
        )


class PointList(List[Point], _PointsMixin):

    @classmethod
    def from_point(cls, point: Point) -> 'PointList':
        return cls((point,))

    @classmethod
    def from_xy_pairs(cls, xy_pairs: Iterable[Tuple[_V, _V]]) -> 'PointList':
        return cls(Point.from_xy_pair(xy_pair) for xy_pair in xy_pairs)

    @classmethod
    def from_flatten_xy_pairs(cls, flatten_xy_pairs: Sequence[_V]) -> 'PointList':
        assert len(flatten_xy_pairs) % 2 == 0
        return cls(
            Point.create(y=flatten_xy_pairs[idx + 1], x=flatten_xy_pairs[idx])
            for idx in range(0, len(flatten_xy_pairs), 2)
        )

    @classmethod
    def from_np_array(cls, np_points: np.ndarray) -> 'PointList':
        points = cls.from_xy_pairs(np_points.tolist())
        assert np_points.ndim == 2 and np_points.shape[1] == 2
        return points

    def to_point_tuple(self) -> 'PointTuple':
        return PointTuple(self)

    def copy(self) -> 'PointList':
        return PointList(self)


class PointTuple(Tuple[Point, ...], _PointsMixin):

    @classmethod
    def from_point(cls, point: Point) -> 'PointTuple':
        return cls((point,))

    @classmethod
    def from_xy_pairs(cls, xy_pairs: Iterable[Tuple[_V, _V]]) -> 'PointTuple':
        return cls(Point.from_xy_pair(xy_pair) for xy_pair in xy_pairs)

    @classmethod
    def from_flatten_xy_pairs(cls, flatten_xy_pairs: Sequence[_V]) -> 'PointTuple':
        return PointList.from_flatten_xy_pairs(flatten_xy_pairs).to_point_tuple()

    @classmethod
    def from_np_array(cls, np_points: np.ndarray) -> 'PointTuple':
        return PointList.from_np_array(np_points).to_point_tuple()

    def to_clipped_points(self, shapable_or_shape: Union[Shapable, Tuple[int, int]]):
        return PointTuple(
            point.to_clipped_point(shapable_or_shape) for point in self
        )

    def to_shifted_points(self, offset_y: int = 0, offset_x: int = 0):
        return PointTuple(
            point.to_shifted_point(offset_y=offset_y, offset_x=offset_x) for point in self
        )

    def to_relative_points(self, origin_y: int, origin_x: int):
        return self.to_shifted_points(offset_y=-origin_y, offset_x=-origin_x)

    def to_conducted_resized_points(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ):
        return PointTuple(
            point.to_conducted_resized_point(
                shapable_or_shape=shapable_or_shape,
                resized_height=resized_height,
                resized_width=resized_width,
            ) for point in self
        )
