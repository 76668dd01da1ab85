import numpy as np


class STRtree:
    """Bounding-box extent index (linear scan; reference workloads are
    small enough that a packed tree is unnecessary)."""

    def __init__(self, geoms):
        self._geoms = tuple(geoms)
        self._bounds = np.asarray(
            [g.bounds for g in self._geoms], dtype=np.float64
        ).reshape(-1, 4)

    def query(self, geom, predicate=None):
        if not len(self._bounds):
            return []
        x0, y0, x1, y1 = geom.bounds
        hit = (
            (self._bounds[:, 0] <= x1) & (x0 <= self._bounds[:, 2])
            & (self._bounds[:, 1] <= y1) & (y0 <= self._bounds[:, 3])
        )
        # shapely 2.x semantics: query returns INDICES into the input
        # geometry sequence (the reference indexes with them,
        # page_text_region.py:909-910).
        return np.nonzero(hit)[0]
