"""Batched device forms of the text-region hot loops.

The adaptive-scaling stage (pipeline/text_detection/page_text_region.py,
behavioral spec vkit/pipeline/text_detection/page_text_region.py:561-858)
rotates every flattened text region to horizontal and resizes it to a
target char height — per-region host warps in the reference.  Here the
rotate+resize compose into ONE affine matrix per region and the whole
region batch runs through the two-shear MXU warp (ops/warp_mxu.py) in a
single program; uniform tile canvases keep shapes static.

The per-char gaussian heatmaps (engine/char_heatmap/default.py, spec
vkit/engine/char_heatmap/default.py:30-195 + page_text_region_label.py:443)
warp a gaussian bump into each char quad — per-char cv.warpPerspective in
the reference.  The device form evaluates the bump ANALYTICALLY at the
inverse-homography coordinates (elementwise math on the MXU-free VPU
path, no gathers): one program for every char tile.
"""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Region flatten: rotate-to-horizontal + resize, one affine program.
# ---------------------------------------------------------------------------


def plan_region_flatten(
    angles_deg: Sequence[float],
    scales: Sequence[float],
    src_tile: int,
    dst_tile: int,
):
    """Per-region forward mats: scale about the ROTATED content origin.

    Each region patch lives in the top-left of its (src_tile, src_tile)
    canvas; the region rotates by its flattening angle about the canvas
    center, then translates so the rotated bounding box's corner sits at
    the dst origin, then scales — the flatten-trim-resize chain of
    FlattenedTextRegion composed into one resampling pass.

    Returns (mats (R, 3, 3) float64, out_extents (R, 2) int: the rotated
    + scaled content extent inside the dst tile).
    """
    angles = np.asarray(angles_deg, dtype=np.float64)
    scales_np = np.asarray(scales, dtype=np.float64)
    n = len(angles)
    c = (src_tile - 1) / 2.0
    rad = np.deg2rad(angles)
    cos = np.cos(rad)
    sin = np.sin(rad)

    # Rotated canvas corners -> translation that zeroes the min corner
    # (the reference's trim-to-mask-bbox, computed analytically on the
    # full canvas).
    corners = np.asarray(
        [(0.0, 0.0), (src_tile - 1.0, 0.0),
         (src_tile - 1.0, src_tile - 1.0), (0.0, src_tile - 1.0)]
    )
    mats = np.zeros((n, 3, 3), dtype=np.float64)
    extents = np.zeros((n, 2), dtype=np.int64)
    for i in range(n):
        rot = np.asarray([
            [cos[i], -sin[i], c - cos[i] * c + sin[i] * c],
            [sin[i], cos[i], c - sin[i] * c - cos[i] * c],
            [0.0, 0.0, 1.0],
        ])
        xy = (rot[:2, :2] @ corners.T).T + rot[:2, 2]
        shift = xy.min(axis=0)
        span = xy.max(axis=0) - shift
        mat = rot.copy()
        mat[:2, 2] -= shift
        mat[:2] *= scales_np[i]
        mats[i] = mat
        extents[i] = np.ceil(span * scales_np[i] - 1e-6).astype(np.int64) + 1
    extents = np.minimum(extents, dst_tile)
    return mats, extents


def batch_flatten_regions(
    patches,
    angles_deg: Sequence[float],
    scales: Sequence[float],
    dst_tile: int,
    border_value: float = 0.0,
):
    """Rotate+scale every (src_tile, src_tile, C) region patch in ONE
    two-shear MXU program -> (R, dst_tile, dst_tile, C) float32.

    Returns (warped, extents (R, 2)): content occupies
    [:ey, :ex] of each dst tile."""
    from .warp_mxu import (
        apply_affine_warp,
        apply_affine_warp_quad,
        plan_affine_warp,
        quadrant_reduce_mats,
    )

    patches = jnp.asarray(patches)
    src_tile = int(patches.shape[1])
    assert patches.shape[2] == src_tile, 'square source tiles required'
    mats, extents = plan_region_flatten(
        angles_deg, scales, src_tile, dst_tile
    )
    quads, reduced = quadrant_reduce_mats(mats, (src_tile, src_tile))
    plan, statics = plan_affine_warp(
        reduced, (src_tile, src_tile), (dst_tile, dst_tile), canonical=True
    )
    if (quads == 0).all():
        fn = jax.jit(
            apply_affine_warp, static_argnames=('statics', 'border_value')
        )
        warped = fn(patches, plan, statics=statics,
                    border_value=border_value)
    else:
        warped = apply_affine_warp_quad(
            patches, jnp.asarray(quads), plan, statics=statics,
            border_value=border_value,
        )
    return warped, extents


# ---------------------------------------------------------------------------
# Char heatmap tiles: analytic gaussian bump through per-char inverse
# homographies.
# ---------------------------------------------------------------------------


def plan_char_heatmap_mats(
    quads_xy: np.ndarray,
    char_radius: int = 25,
) -> np.ndarray:
    """Inverse homographies mapping tile coords -> bump coords.

    ``quads_xy``: (G, 4, 2) float, each char's polygon corners RELATIVE
    to its own tile origin (the char bbox corner), ordered like
    Box.to_polygon.  The bump square spans [0, 2*radius]."""
    from .warp import solve_perspective_batch

    edge = 2 * char_radius
    bump_quad = np.asarray(
        [(0, 0), (edge, 0), (edge, edge), (0, edge)], dtype=np.float64
    )
    g = len(quads_xy)
    mats = solve_perspective_batch(
        np.broadcast_to(bump_quad, (g, 4, 2)),
        np.asarray(quads_xy, dtype=np.float64),
    )
    return np.linalg.inv(mats)


import functools


@functools.partial(
    jax.jit, static_argnames=('tile', 'char_radius', 'distance_factor')
)
def char_heatmap_tiles(
    mats_inv,
    tile: Optional[int] = None,
    char_radius: int = 25,
    distance_factor: float = 2.25,
):
    """(G, T, T) gaussian bump tiles, evaluated analytically.

    Per pixel: uv = H_inv @ (x, y, 1); r = ||uv - radius|| / radius;
    value = exp(-0.5 * (factor * r)^2), zero outside the bump square —
    the device twin of warping the sampled bump raster (differences are
    bounded by the host path's bilinear interpolation step)."""
    mats_inv = jnp.asarray(mats_inv, dtype=jnp.float32)
    t = tile if tile is not None else 64
    xs = jnp.arange(t, dtype=jnp.float32)[None, :]
    ys = jnp.arange(t, dtype=jnp.float32)[:, None]
    ones = jnp.ones((t, t), dtype=jnp.float32)
    # (G, 3, T, T) = H_inv @ (x, y, 1)
    uvw = jnp.einsum(
        'gij,jhw->gihw',
        mats_inv,
        jnp.stack([jnp.broadcast_to(xs, (t, t)),
                   jnp.broadcast_to(ys, (t, t)), ones]),
    )
    w = jnp.where(jnp.abs(uvw[:, 2]) < 1e-9, 1e-9, uvw[:, 2])
    u = uvw[:, 0] / w
    v = uvw[:, 1] / w
    radius = float(char_radius)
    edge = 2.0 * radius
    r = jnp.sqrt((u - radius) ** 2 + (v - radius) ** 2) / radius
    value = jnp.exp(-0.5 * (distance_factor * r) ** 2)
    inside = (u >= 0) & (u <= edge) & (v >= 0) & (v <= edge)
    return jnp.where(inside, value, 0.0)


def batch_char_heatmaps(
    quads_xy: np.ndarray,
    tile: int = 64,
    char_radius: int = 25,
    distance_factor: float = 2.25,
):
    """Host-plan + device-evaluate all char bump tiles in one program."""
    mats_inv = plan_char_heatmap_mats(quads_xy, char_radius)
    return char_heatmap_tiles(
        jnp.asarray(mats_inv, dtype=jnp.float32),
        tile=tile, char_radius=char_radius,
        distance_factor=distance_factor,
    )
