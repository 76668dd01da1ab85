"""Line element.

Capability parity: vkit/element/line.py:22-69.
"""
from typing import Sequence, Tuple, Union

import attr

from .point import Point

_V = Union[float, int, str]


@attr.define(frozen=True)
class Line:
    point_begin: Point
    point_end: Point

    @classmethod
    def from_xy_pairs(cls, xy_pairs: Sequence[Tuple[_V, _V]]) -> 'Line':
        assert len(xy_pairs) == 2
        return cls(
            point_begin=Point.from_xy_pair(xy_pairs[0]),
            point_end=Point.from_xy_pair(xy_pairs[1]),
        )

    def to_xy_pairs(self):
        return [self.point_begin.to_xy_pair(), self.point_end.to_xy_pair()]

    @classmethod
    def from_flatten_xy_pairs(cls, flatten_xy_pairs: Sequence[_V]) -> 'Line':
        assert len(flatten_xy_pairs) == 4
        x0, y0, x1, y1 = flatten_xy_pairs
        return cls(
            point_begin=Point.create(y=y0, x=x0),
            point_end=Point.create(y=y1, x=x1),
        )

    def to_flatten_xy_pairs(self):
        return [
            self.point_begin.x,
            self.point_begin.y,
            self.point_end.x,
            self.point_end.y,
        ]

    def get_center_point(self) -> Point:
        return Point.create(
            y=(self.point_begin.smooth_y + self.point_end.smooth_y) / 2,
            x=(self.point_begin.smooth_x + self.point_end.smooth_x) / 2,
        )
