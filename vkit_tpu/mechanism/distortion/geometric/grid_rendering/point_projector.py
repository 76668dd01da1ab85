"""Point projector base.

Capability parity: vkit/mechanism/distortion/geometric/grid_rendering/
point_projector.py:19-28.  Subclasses may override ``project_np_points`` with
a vectorized implementation (preferred; the per-point path is the fallback).
"""
from typing import Iterable, Union

import numpy as np

from .....element import Point, PointList, PointTuple


class PointProjector:

    def project_point(self, src_point: Point) -> Point:
        # Fallback through the vectorized path.
        out = self.project_np_points(
            np.asarray([[src_point.smooth_x, src_point.smooth_y]], dtype=np.float64)
        )
        return Point.create(y=float(out[0, 1]), x=float(out[0, 0]))

    def project_np_points(self, np_points_xy: np.ndarray) -> np.ndarray:
        # Fallback through the per-point path.
        points = PointList()
        for x, y in np_points_xy:
            points.append(self.project_point(Point.create(y=float(y), x=float(x))))
        return np.asarray(points.to_smooth_xy_pairs(), dtype=np.float64)

    def project_points(
        self,
        src_points: Union[PointList, PointTuple, Iterable[Point]],
    ) -> PointTuple:
        src_points = PointTuple(src_points)
        np_points = np.asarray(src_points.to_smooth_xy_pairs(), dtype=np.float64)
        np_out = self.project_np_points(np_points)
        return PointTuple.from_xy_pairs((float(x), float(y)) for x, y in np_out)
