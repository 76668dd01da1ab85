import numpy as np


class CAP_STYLE:
    round = 1
    flat = 2
    square = 3


class JOIN_STYLE:
    round = 1
    mitre = 2
    bevel = 3


class _Coords(tuple):
    pass


class Point:

    def __init__(self, x, y=None):
        if y is None:
            x, y = x
        self.x = float(x)
        self.y = float(y)

    @property
    def coords(self):
        return _Coords(((self.x, self.y),))

    @property
    def bounds(self):
        return (self.x, self.y, self.x, self.y)


class _Exterior:

    def __init__(self, coords):
        self.coords = _Coords(tuple(coords))


class Polygon:

    def __init__(self, xy_pairs=()):
        self._xy = np.asarray([tuple(p)[:2] for p in xy_pairs], dtype=np.float64)
        self.exterior = _Exterior((float(x), float(y)) for x, y in self._xy)

    # -- metrics ---------------------------------------------------------

    @property
    def area(self) -> float:
        from vkit_tpu import geometry as backend
        if len(self._xy) < 3:
            return 0.0
        return float(backend.polygon_area(self._xy))

    @property
    def length(self) -> float:
        from vkit_tpu import geometry as backend
        if len(self._xy) < 2:
            return 0.0
        return float(backend.polygon_perimeter(self._xy))

    @property
    def centroid(self) -> Point:
        from vkit_tpu import geometry as backend
        cx, cy = backend.polygon_centroid(self._xy)
        return Point(cx, cy)

    @property
    def is_valid(self) -> bool:
        return len(self._xy) >= 3 and self.area > 0

    @property
    def minimum_rotated_rectangle(self) -> 'Polygon':
        from vkit_tpu import geometry as backend
        corners = backend.min_area_rect(self._xy)
        return Polygon([(float(x), float(y)) for x, y in corners])

    @property
    def geoms(self):
        return (self,)

    # -- set ops (raster-backed) ------------------------------------------

    def _bounds(self):
        return (
            self._xy[:, 0].min(), self._xy[:, 1].min(),
            self._xy[:, 0].max(), self._xy[:, 1].max(),
        )

    @property
    def bounds(self):
        return self._bounds()

    def _raster(self, origin, shape):
        from vkit_tpu import geometry as backend
        rel = self._xy - np.asarray(origin, dtype=np.float64)
        return backend.fill_poly(rel, shape).astype(bool)

    def _shared_frame(self, other):
        ax0, ay0, ax1, ay1 = self._bounds()
        bx0, by0, bx1, by1 = other._bounds()
        x0 = int(np.floor(min(ax0, bx0)))
        y0 = int(np.floor(min(ay0, by0)))
        x1 = int(np.ceil(max(ax1, bx1)))
        y1 = int(np.ceil(max(ay1, by1)))
        shape = (max(1, y1 - y0 + 1), max(1, x1 - x0 + 1))
        return (x0, y0), shape

    def intersects(self, other: 'Polygon') -> bool:
        ax0, ay0, ax1, ay1 = self._bounds()
        bx0, by0, bx1, by1 = other._bounds()
        if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
            return False
        origin, shape = self._shared_frame(other)
        return bool((self._raster(origin, shape) & other._raster(origin, shape)).any())

    def intersection(self, other: 'Polygon') -> '_RasterArea':
        if not self.intersects(other):
            return _RasterArea(0.0)
        origin, shape = self._shared_frame(other)
        overlap = self._raster(origin, shape) & other._raster(origin, shape)
        return _RasterArea(float(overlap.sum()))

    def buffer(self, distance, cap_style=None, join_style=None) -> 'Polygon':
        from vkit_tpu import geometry as backend
        if distance == 0 or len(self._xy) < 3:
            return self
        pieces = backend.offset_polygon(self._xy, float(distance))
        if not pieces:
            return self
        largest = max(pieces, key=lambda p: abs(backend.polygon_area(np.asarray(p))))
        return Polygon([(float(x), float(y)) for x, y in largest])


class _RasterArea:
    """Stand-in intersection result: only .area is consumed."""

    def __init__(self, area: float):
        self.area = area


class MultiPolygon:

    def __init__(self, polygons=()):
        self.geoms = tuple(polygons)

    def __iter__(self):
        return iter(self.geoms)


class GeometryCollection:

    def __init__(self, geoms=()):
        self.geoms = tuple(geoms)


def box(minx, miny, maxx, maxy) -> Polygon:
    return Polygon([(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)])
