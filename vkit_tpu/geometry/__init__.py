"""Host-side computational geometry backend.

Prefers the first-party C++ implementation (vkit_tpu/native, via ctypes) for
the hot entry points; falls back to the numpy implementation transparently.
"""
from ._numpy_impl import (
    convex_hull,
    disconnected_components,
    external_contours,
    fill_poly,
    fill_polys,
    min_area_rect,
    offset_polygon,
    point_in_polygon,
    polygon_area,
    polygon_centroid,
    polygon_perimeter,
    polygon_signed_area,
    polygons_intersect_area,
    unionize_polygons_raster,
)

try:  # pragma: no cover - exercised when the native lib is built.
    from . import _native  # noqa: F401
    from ._native import fill_poly, external_contours, disconnected_components  # type: ignore  # noqa: F811,E501
    HAS_NATIVE = True
except Exception:  # noqa: BLE001
    HAS_NATIVE = False
