import numpy as np

from .geometry import MultiPolygon, Polygon


def unary_union(polygons):
    """Raster-space union via the first-party backend."""
    from vkit_tpu import geometry as backend
    np_polys = [np.asarray(p.exterior.coords, dtype=np.float64) for p in polygons]
    merged, _ = backend.unionize_polygons_raster(np_polys)
    out = [Polygon([(float(x), float(y)) for x, y in m]) for m in merged]
    if len(out) == 1:
        return out[0]
    return MultiPolygon(out)
