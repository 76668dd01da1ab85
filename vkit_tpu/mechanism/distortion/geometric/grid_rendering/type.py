"""ImageGrid: 2-D lattice of points + dense backward-map generation.

Capability parity: vkit/mechanism/distortion/geometric/grid_rendering/
type.py:26-261.  Per-cell homographies are solved in one batched linear solve
(vkit_tpu/ops/warp.solve_perspective math, batched with numpy); the dense
(map_y, map_x) field is assembled per cell and consumed by the device warp
kernel.  Uncovered pixels keep map value 0 (sampling src (0,0)), matching the
reference's zero-initialized maps; the active mask excludes them.
"""
from itertools import chain
from typing import List, Optional, Tuple, Union

import attr
import numpy as np

from ..... import geometry
from .....element import Point, PointList, Polygon, Shapable


from .....ops.warp import solve_perspective_batch  # noqa: F401


@attr.define
class ImageGrid:
    points_2d: List[PointList]
    # Set iff this is a src grid (uniform lattice with known cell size).
    grid_size: Optional[int] = None
    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    # ------------------------------------------------------------------
    # Basic geometry.
    # ------------------------------------------------------------------
    @property
    def num_rows(self) -> int:
        return len(self.points_2d)

    @property
    def num_cols(self) -> int:
        return len(self.points_2d[0])

    @property
    def shape(self) -> Tuple[int, int]:
        return self.num_rows, self.num_cols

    @property
    def flatten_points(self) -> PointList:
        return PointList(chain.from_iterable(self.points_2d))

    def _np_points(self) -> np.ndarray:
        """(num_rows, num_cols, 2) float64 xy (smooth)."""
        cached = self._cache.get('np_points')
        if cached is None:
            cached = np.asarray(
                [
                    [(p.smooth_x, p.smooth_y) for p in row]
                    for row in self.points_2d
                ],
                dtype=np.float64,
            )
            self._cache['np_points'] = cached
        return cached

    def _np_int_points(self) -> np.ndarray:
        cached = self._cache.get('np_int_points')
        if cached is None:
            cached = np.asarray(
                [[(p.x, p.y) for p in row] for row in self.points_2d],
                dtype=np.int64,
            )
            self._cache['np_int_points'] = cached
        return cached

    @property
    def image_height(self) -> int:
        pts = self._np_int_points()
        assert pts[..., 1].min() == 0
        return int(pts[..., 1].max()) + 1

    @property
    def image_width(self) -> int:
        pts = self._np_int_points()
        assert pts[..., 0].min() == 0
        return int(pts[..., 0].max()) + 1

    @property
    def image_shape(self) -> Tuple[int, int]:
        return self.image_height, self.image_width

    def compatible_with(self, other: 'ImageGrid') -> bool:
        return self.shape == other.shape

    def generate_polygon(self, polygon_row: int, polygon_col: int) -> Polygon:
        return Polygon.create(
            points=(
                self.points_2d[polygon_row][polygon_col],
                self.points_2d[polygon_row][polygon_col + 1],
                self.points_2d[polygon_row + 1][polygon_col + 1],
                self.points_2d[polygon_row + 1][polygon_col],
            ),
        )

    def generate_polygon_row_col(self):
        for polygon_row in range(self.num_rows - 1):
            for polygon_col in range(self.num_cols - 1):
                yield polygon_row, polygon_col

    def zip_polygons(self, other: 'ImageGrid'):
        assert self.compatible_with(other)
        for polygon_row, polygon_col in self.generate_polygon_row_col():
            yield (
                (polygon_row, polygon_col),
                self.generate_polygon(polygon_row, polygon_col),
                other.generate_polygon(polygon_row, polygon_col),
            )

    def generate_border_polygon(self) -> Polygon:
        points = PointList()
        for point in self.points_2d[0]:
            points.append(point)
        for row in range(1, self.num_rows):
            points.append(self.points_2d[row][-1])
        for col in reversed(range(self.num_cols - 1)):
            points.append(self.points_2d[-1][col])
        for row in reversed(range(1, self.num_rows - 1)):
            points.append(self.points_2d[row][0])
        return Polygon.create(points=points)

    def to_conducted_resized_image_grid(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: int,
        resized_width: int,
    ) -> 'ImageGrid':
        new_points_2d: List[PointList] = []
        for points in self.points_2d:
            new_points_2d.append(
                PointList(
                    point.to_conducted_resized_point(
                        shapable_or_shape=shapable_or_shape,
                        resized_height=resized_height,
                        resized_width=resized_width,
                    ) for point in points
                )
            )
        return ImageGrid(points_2d=new_points_2d)

    # ------------------------------------------------------------------
    # Homographies (batched).
    # ------------------------------------------------------------------
    def _quads(self) -> np.ndarray:
        """All cell quads (N, 4, 2) int-rounded xy, clockwise from up-left."""
        pts = self._np_int_points().astype(np.float64)
        ul = pts[:-1, :-1]
        ur = pts[:-1, 1:]
        dr = pts[1:, 1:]
        dl = pts[1:, :-1]
        quads = np.stack([ul, ur, dr, dl], axis=2)  # (R-1, C-1, 4, 2)
        return quads.reshape(-1, 4, 2)

    def _all_trans_mats(self, other: 'ImageGrid', inverse: bool) -> np.ndarray:
        key = ('inv_mats' if inverse else 'mats', id(other))
        cached = self._cache.get(key)
        if cached is None:
            src = self._quads()
            dst = other._quads()
            if inverse:
                cached = solve_perspective_batch(dst, src)
            else:
                cached = solve_perspective_batch(src, dst)
            self._cache[key] = cached
        return cached

    def get_trans_mat(self, polygon_row: int, polygon_col: int, other: 'ImageGrid'):
        idx = polygon_row * (self.num_cols - 1) + polygon_col
        return self._all_trans_mats(other, inverse=False)[idx]

    def get_inv_trans_mat(self, polygon_row: int, polygon_col: int, other: 'ImageGrid'):
        idx = polygon_row * (self.num_cols - 1) + polygon_col
        return self._all_trans_mats(other, inverse=True)[idx]

    # ------------------------------------------------------------------
    # Dense backward map.
    # ------------------------------------------------------------------
    def generate_remap_params(self, dst_image_grid: 'ImageGrid'):
        map_y, map_x, _ = self.generate_remap_params_with_coverage(dst_image_grid)
        return map_y, map_x

    def generate_remap_params_with_coverage(self, dst_image_grid: 'ImageGrid'):
        """Like generate_remap_params, plus the painted-pixel mask (pixels
        covered by some grid cell; the rest keep the zero-initialized maps,
        mirroring the reference's cv2.remap input)."""
        cached = self._cache.get('remap_params')
        if cached is not None:
            return cached

        dst_h = dst_image_grid.image_height
        dst_w = dst_image_grid.image_width
        map_y = np.zeros((dst_h, dst_w), dtype=np.float32)
        map_x = np.zeros((dst_h, dst_w), dtype=np.float32)
        coverage = np.zeros((dst_h, dst_w), dtype=bool)

        inv_mats = self._all_trans_mats(dst_image_grid, inverse=True)
        dst_quads = dst_image_grid._quads()

        for idx in range(dst_quads.shape[0]):
            quad = dst_quads[idx]
            x_min = max(int(np.floor(quad[:, 0].min())), 0)
            y_min = max(int(np.floor(quad[:, 1].min())), 0)
            x_max = min(int(np.ceil(quad[:, 0].max())), dst_w - 1)
            y_max = min(int(np.ceil(quad[:, 1].max())), dst_h - 1)
            if x_max < x_min or y_max < y_min:
                continue
            local = geometry.fill_poly(
                quad - np.array([x_min, y_min], dtype=np.float64),
                (y_max - y_min + 1, x_max - x_min + 1),
            ).astype(bool)
            yy, xx = np.nonzero(local)
            if not len(yy):
                continue
            dst_y = yy + y_min
            dst_x = xx + x_min
            homo = np.stack(
                [dst_x.astype(np.float64), dst_y.astype(np.float64), np.ones_like(yy, dtype=np.float64)]
            )
            src = inv_mats[idx] @ homo
            denom = src[2]
            with np.errstate(divide='ignore', invalid='ignore'):
                src_xy = src[:2] / denom
            keep = denom != 0
            map_y[dst_y[keep], dst_x[keep]] = src_xy[1][keep]
            map_x[dst_y[keep], dst_x[keep]] = src_xy[0][keep]
            coverage[dst_y[keep], dst_x[keep]] = True

        self._cache['remap_params'] = (map_y, map_x, coverage)
        return map_y, map_x, coverage
