"""Minimal shapely stand-in backed by vkit_tpu.geometry.

Covers the surface the reference exercises: Polygon/MultiPolygon/
GeometryCollection/Point/box, area/length/centroid/exterior/
minimum_rotated_rectangle/buffer/intersects/intersection, unary_union,
STRtree extent queries, and make_valid.
"""
from . import geometry, ops, strtree, validation  # noqa: F401
