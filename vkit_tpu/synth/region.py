"""Adaptive-scaling text-region stream: flatten -> stack -> label -> crop.

A tensor-first post-pass over SynthBatchResult batches producing the
OTHER half of the reference's training output family — stacked region
pages with char-level regression labels and region crops:

  1. Per page, chars group under their word polygon (the synth stream's
     text regions); each region gets a flattening angle (undo the word's
     post-warp orientation) and an adaptive scale (target char height /
     the region's median char height).
  2. ALL regions of the whole batch flatten in a few device programs —
     rotate+scale composed into one affine per region, bucketed by
     source-tile size (ops/region.batch_flatten_regions); char polygons
     co-transform analytically through the same mats in one einsum.
  3. Flattened regions shelf-pack onto STATIC square canvases (pinwheel
     background) and composite in one device scan program per tile
     bucket (ops/glyph.composite_patches).
  4. Labels: per-char gaussian score maps render on device
     (ops/region.batch_char_heatmaps) and the char regression encodings
     (up-left offsets, clockwise angle distribution, corner distances)
     compute VECTORIZED over every stacked char at once.
  5. Optional region crops window the stacked pages through the same
     device crop extractor the synth stream uses.

Behavioral spec: vkit/pipeline/text_detection/page_text_region.py:561-858
(flatten + stack), page_text_region_label.py:443-716 (char regression +
gaussian labels), page_text_region_cropping.py:36-110 (crops).  The
host reference resamples every region three times and warps a gaussian
bump raster per char; here each region is ONE resample on the MXU and
each bump is analytic.
"""
import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
from numpy.random import Generator as RandomGenerator

from ..element import Box, Polygon
from .. import geometry

TWO_PI = 2.0 * math.pi

_SRC_LADDER = (64, 128, 192, 256, 384, 512)


class RegionStreamConfig(NamedTuple):
    """Knobs of the adaptive-scaling output family.

    ``page_size``: static stacked-canvas side (one compiled program).
    ``target_char_height``: the adaptive-scaling target — every region
    resizes so its median char height lands here (the reference's
    text_region_resize_char_height_median sampling collapses to its
    midpoint by default).
    """
    page_size: int = 640
    target_char_height: int = 36
    page_pad: int = 10
    region_pad: int = 2
    dilate_ratio: float = 0.1
    dst_tile_max: int = 512
    gaussian_tile: int = 64
    num_crops_per_page: int = 0
    crop_size: int = 320


class CharRegression(NamedTuple):
    """Vectorized char regression labels for ONE stacked page — the
    model-facing encodings of PageCharRegressionLabel
    (page_text_region_label.py:227-234), one row per char centroid."""
    label_points_yx: np.ndarray       # (G, 2) f64 — centroid label points
    corners_xy: np.ndarray            # (G, 4, 2) f64 — char quad corners
    up_left_offsets_yx: np.ndarray    # (G, 2) f64
    angle_distributions: np.ndarray   # (G, 4) f64, normalized clockwise
    distances: np.ndarray             # (G, 4) f64
    valids: np.ndarray                # (G,) bool — point inside its quad


class RegionBatchResult(NamedTuple):
    images: np.ndarray                 # (M, S, S, 3) uint8 stacked pages
    active_masks: np.ndarray           # (M, S, S) uint8
    gaussian_maps: np.ndarray          # (M, S, S) float32
    region_boxes: Sequence[List[Box]]          # per stacked page
    char_polygons: Sequence[List[Polygon]]     # per stacked page
    regression: Sequence[CharRegression]       # per stacked page
    crop_images: Optional[np.ndarray] = None   # (K, C, C, 3) uint8
    crop_gaussians: Optional[np.ndarray] = None  # (K, C, C) float32
    crop_active: Optional[np.ndarray] = None     # (K, C, C) uint8
    crop_page_ids: Optional[np.ndarray] = None   # (K,) int32


def char_regression_encodings(
    corners_xy: np.ndarray,
    label_points_xy: np.ndarray,
) -> CharRegression:
    """All regression encodings in one vectorized pass.

    The per-object twin is QuadGeometry (page_text_region_label.py:62-81):
    per-corner distances, clockwise corner-angle deltas (summing to 2*pi
    iff the label point is interior), the normalized angle distribution,
    and the up-left offset."""
    corners = np.asarray(corners_xy, dtype=np.float64).reshape(-1, 4, 2)
    pts = np.asarray(label_points_xy, dtype=np.float64).reshape(-1, 2)
    offsets = corners - pts[:, None, :]                    # (G, 4, 2) xy
    distances = np.hypot(offsets[..., 0], offsets[..., 1])  # (G, 4)
    thetas = np.mod(np.arctan2(offsets[..., 1], offsets[..., 0]), TWO_PI)
    deltas = np.mod(
        np.roll(thetas, -1, axis=1) - thetas + math.pi, TWO_PI
    ) - math.pi
    deltas = np.where(deltas < 0, deltas + TWO_PI, deltas)  # clockwise
    total = deltas.sum(axis=1)
    valids = np.isclose(total, TWO_PI, rtol=0.012)
    sums = deltas.sum(axis=1, keepdims=True)
    with np.errstate(invalid='ignore', divide='ignore'):
        dist = np.where(sums > 0, deltas / sums, 0.25)
    return CharRegression(
        label_points_yx=pts[:, ::-1].copy(),
        corners_xy=corners,
        up_left_offsets_yx=offsets[:, 0, ::-1].copy(),
        angle_distributions=dist,
        distances=distances,
        valids=valids,
    )


def _assign_chars_to_words(
    word_polygons: Sequence[Polygon],
    char_polygons: Sequence[Polygon],
) -> List[List[int]]:
    """Char -> word grouping by centroid-in-bbox (PageTextRegionStep.
    _assign_chars semantics: each char joins the region containing it;
    unmatched chars join the nearest region center)."""
    if not word_polygons:
        return []
    boxes = np.asarray([
        [p.np_xy[:, 1].min(), p.np_xy[:, 1].max(),
         p.np_xy[:, 0].min(), p.np_xy[:, 0].max()]
        for p in word_polygons
    ])  # (W, 4) up/down/left/right
    centers = np.stack([
        (boxes[:, 0] + boxes[:, 1]) / 2, (boxes[:, 2] + boxes[:, 3]) / 2,
    ], axis=1)                                             # (W, 2) yx
    groups: List[List[int]] = [[] for _ in word_polygons]
    if not char_polygons:
        return groups
    cxy = np.asarray([p.np_xy.mean(axis=0) for p in char_polygons])  # (G,2) xy
    inside = (
        (cxy[:, 1][:, None] >= boxes[None, :, 0] - 0.5)
        & (cxy[:, 1][:, None] <= boxes[None, :, 1] + 0.5)
        & (cxy[:, 0][:, None] >= boxes[None, :, 2] - 0.5)
        & (cxy[:, 0][:, None] <= boxes[None, :, 3] + 0.5)
    )                                                      # (G, W)
    d2 = (
        (cxy[:, 1][:, None] - centers[None, :, 0]) ** 2
        + (cxy[:, 0][:, None] - centers[None, :, 1]) ** 2
    )
    pick = np.where(inside, d2, np.inf).argmin(axis=1)
    none_inside = ~inside.any(axis=1)
    pick[none_inside] = d2[none_inside].argmin(axis=1)
    for char_idx, word_idx in enumerate(pick):
        groups[int(word_idx)].append(char_idx)
    return groups


def _flatten_angle_deg(polygon: Polygon) -> float:
    """Rotation undoing the word's orientation (its up edge p0 -> p1)."""
    xy = polygon.np_xy
    dx = float(xy[1, 0] - xy[0, 0])
    dy = float(xy[1, 1] - xy[0, 1])
    if abs(dx) < 1e-9 and abs(dy) < 1e-9:
        return 0.0
    return -math.degrees(math.atan2(dy, dx))


def _char_heights(char_polygons: Sequence[Polygon], idxs: List[int]):
    hs = []
    for i in idxs:
        xy = char_polygons[i].np_xy
        left = math.hypot(xy[3, 0] - xy[0, 0], xy[3, 1] - xy[0, 1])
        right = math.hypot(xy[2, 0] - xy[1, 0], xy[2, 1] - xy[1, 1])
        hs.append((left + right) / 2.0)
    return hs


class _Region(NamedTuple):
    page_id: int
    window: Box          # source window on the synth page
    angle_deg: float
    scale: float
    char_idxs: List[int]


def _ladder(size: int) -> int:
    for t in _SRC_LADDER:
        if size <= t:
            return t
    return ((size + 127) // 128) * 128


def collect_regions(
    result,
    config: RegionStreamConfig,
) -> List[_Region]:
    """Plan one flattenable region per word that owns >= 1 char."""
    regions: List[_Region] = []
    page_h, page_w = result.images.shape[1:3]
    for pid, (words, chars) in enumerate(
        zip(result.word_polygons, result.char_polygons)
    ):
        groups = _assign_chars_to_words(words, chars)
        for word_idx, char_idxs in enumerate(groups):
            if not char_idxs:
                continue
            xy = words[word_idx].np_xy
            up = float(xy[:, 1].min())
            down = float(xy[:, 1].max())
            left = float(xy[:, 0].min())
            right = float(xy[:, 0].max())
            pad = config.dilate_ratio * max(down - up, right - left) / 2
            window = Box(
                up=int(max(math.floor(up - pad), 0)),
                down=int(min(math.ceil(down + pad), page_h - 1)),
                left=int(max(math.floor(left - pad), 0)),
                right=int(min(math.ceil(right + pad), page_w - 1)),
            )
            if window.height < 2 or window.width < 2:
                continue
            heights = _char_heights(chars, char_idxs)
            median = float(np.median(heights)) if heights else 0.0
            if median < 1.0:
                continue
            scale = config.target_char_height / median
            # Bound the flattened extent by the tile budget (the packer
            # canvas is static; a pathological region scales down).
            span = math.hypot(window.height, window.width)
            limit = (config.dst_tile_max - 2) / max(span, 1.0)
            scale = float(min(scale, limit))
            if scale <= 0:
                continue
            regions.append(_Region(
                page_id=pid, window=window,
                angle_deg=_flatten_angle_deg(words[word_idx]),
                scale=scale, char_idxs=char_idxs,
            ))
    return regions


def stack_text_regions(
    result,
    config: RegionStreamConfig,
    rng: RandomGenerator,
) -> Optional[RegionBatchResult]:
    """The full adaptive-scaling post-pass over one SynthBatchResult.

    Returns None when the batch carries no usable text region."""
    import jax.numpy as jnp

    from ..ops.glyph import build_placements, composite_patches
    from ..ops.region import batch_flatten_regions, region_flatten_point_map
    from .device import _char_gaussian_maps, _extract_crops_program
    from ..geometry.packing import pack_rectangles
    from ..pipeline.text_detection.page_text_region import (
        build_background_image_for_stacking,
    )

    regions = collect_regions(result, config)
    if not regions:
        return None

    # ------------------------------------------------------------------
    # Flatten: one device program per source-tile bucket.
    # ------------------------------------------------------------------
    buckets: Dict[int, List[int]] = {}
    for pos, region in enumerate(regions):
        tile = _ladder(max(region.window.height, region.window.width))
        buckets.setdefault(tile, []).append(pos)

    flat_images: List[Optional[np.ndarray]] = [None] * len(regions)
    flat_extents: List[Optional[Tuple[int, int]]] = [None] * len(regions)
    flat_chars: List[List[Polygon]] = [[] for _ in regions]

    for tile, positions in sorted(buckets.items()):
        stack = np.zeros((len(positions), tile, tile, 4), dtype=np.float32)
        angles, scales, extents = [], [], []
        for row, pos in enumerate(positions):
            region = regions[pos]
            w = region.window
            stack[row, :w.height, :w.width, :3] = (
                result.images[region.page_id,
                              w.up:w.down + 1, w.left:w.right + 1]
            )
            # Region mask: the page's active raster inside the window
            # (the synth twin of the bounding extended region mask).
            stack[row, :w.height, :w.width, 3] = (
                result.active_masks[region.page_id,
                                    w.up:w.down + 1, w.left:w.right + 1]
            )
            angles.append(region.angle_deg)
            scales.append(region.scale)
            extents.append((w.height, w.width))

        from ..ops.region import plan_region_flatten
        _, need = plan_region_flatten(
            angles, scales, tile, 1 << 30,
            content_extents=np.asarray(extents),
        )
        dst_tile = min(
            ((int(need.max()) + 127) // 128) * 128, config.dst_tile_max
        )
        warped, w_extents, mats = batch_flatten_regions(
            jnp.asarray(stack), angles, scales, dst_tile,
            content_extents=np.asarray(extents), return_mats=True,
        )
        warped = np.asarray(warped)

        # Char polygons through the SAME mats, one einsum for the bucket.
        groups, points, counts_per_pos = [], [], []
        for row, pos in enumerate(positions):
            region = regions[pos]
            counts = []
            for ci in region.char_idxs:
                xy = result.char_polygons[region.page_id][ci].np_xy
                rel = xy - np.asarray(
                    [region.window.left, region.window.up], np.float64
                )
                points.append(rel)
                groups.extend([row] * len(rel))
                counts.append(len(rel))
            counts_per_pos.append(counts)
        mapped = region_flatten_point_map(
            mats, np.asarray(groups, np.int64),
            np.concatenate(points, axis=0),
        ) if points else np.zeros((0, 2))

        at = 0
        for row, pos in enumerate(positions):
            eh, ew = (int(v) for v in w_extents[row])
            flat_images[pos] = warped[row]
            flat_extents[pos] = (eh, ew)
            for count in counts_per_pos[row]:
                flat_chars[pos].append(
                    Polygon.from_np_xy(mapped[at:at + count])
                )
                at += count

    # ------------------------------------------------------------------
    # Pack: shelf-pack flattened extents onto static canvases.
    # ------------------------------------------------------------------
    s = config.page_size
    inner = config.region_pad
    usable = s - 2 * config.page_pad
    sizes = []
    for pos in range(len(regions)):
        eh, ew = flat_extents[pos]
        sizes.append((min(ew + 2 * inner, usable),
                      min(eh + 2 * inner, usable)))
    placements = pack_rectangles(sizes, usable)

    # Split the one tall shelf stack into page-sized canvases.
    page_of: List[int] = [0] * len(regions)
    offset_of: List[Tuple[int, int]] = [(0, 0)] * len(regions)
    # Shelf rows come back sorted by y; group whole shelves per canvas so
    # regions never straddle a canvas boundary.
    order = sorted(range(len(regions)), key=lambda i: placements[i][1])
    canvas_idx, base_y, next_free = 0, 0, 0
    current_shelf_y = None
    for i in order:
        x, y = placements[i]
        w, h = sizes[i]
        if current_shelf_y is None or y != current_shelf_y:
            # New shelf: does it fit on the current canvas?
            shelf_h = h  # first (tallest) rect of the shelf
            if next_free + shelf_h > usable and next_free > 0:
                canvas_idx += 1
                next_free = 0
            base_y = next_free
            current_shelf_y = y
            shelf_base = base_y
            next_free = base_y + shelf_h
        page_of[i] = canvas_idx
        offset_of[i] = (x, shelf_base)
    num_pages = canvas_idx + 1

    background = build_background_image_for_stacking(s, s).mat
    canvases = np.broadcast_to(
        background, (num_pages, s, s, 3)
    ).copy()

    # ------------------------------------------------------------------
    # Composite: one device scan program per tile bucket.
    # ------------------------------------------------------------------
    region_boxes: List[List[Box]] = [[] for _ in range(num_pages)]
    page_chars: List[List[Polygon]] = [[] for _ in range(num_pages)]
    box_targets: List[Box] = []
    for pos, region in enumerate(regions):
        x, y = offset_of[pos]
        eh, ew = flat_extents[pos]
        up = y + inner + config.page_pad
        left = x + inner + config.page_pad
        target = Box(up, min(up + eh - 1, s - 1),
                     left, min(left + ew - 1, s - 1))
        box_targets.append(target)
        region_boxes[page_of[pos]].append(target)
        for poly in flat_chars[pos]:
            page_chars[page_of[pos]].append(
                poly.to_shifted_polygon(up, left)
            )

    out = jnp.asarray(canvases)
    active = np.zeros((num_pages, s, s), dtype=np.uint8)
    for tile, positions in sorted(buckets.items()):
        # The flattened dst tiles of this bucket share one canvas size.
        dst_tile = flat_images[positions[0]].shape[0]
        tiles_a = np.zeros((len(positions), dst_tile, dst_tile), np.float32)
        tiles_rgb = np.zeros(
            (len(positions), dst_tile, dst_tile, 3), np.float32
        )
        rows = []
        for row, pos in enumerate(positions):
            mat = flat_images[pos]
            eh, ew = flat_extents[pos]
            mask = (mat[..., 3] > 0.5).astype(np.float32)
            tiles_a[row] = mask
            tiles_rgb[row] = np.clip(mat[..., :3], 0, 255)
            target = box_targets[pos]
            th = target.down - target.up + 1
            tw = target.right - target.left + 1
            rows.append({
                'glyph_id': row, 'sample_id': page_of[pos],
                'up': target.up, 'left': target.left,
                'dst_h': th, 'dst_w': tw,
                'src_h': float(th), 'src_w': float(tw),
                'color': np.zeros(3, np.float32),
            })
            active[page_of[pos], target.up:target.down + 1,
                   target.left:target.right + 1] = (
                mask[:th, :tw] > 0.5
            )
        placements_dev = build_placements(rows, bucket=8)
        use_rgbs = np.ones(placements_dev.num_rows, dtype=np.float32)
        out = composite_patches(
            out, jnp.asarray(tiles_a), jnp.asarray(tiles_rgb),
            jnp.asarray(use_rgbs), placements_dev, out_tile=dst_tile,
        )
    images = np.asarray(out)

    # ------------------------------------------------------------------
    # Labels: device gaussians + vectorized regression encodings.
    # ------------------------------------------------------------------
    gaussians = _char_gaussian_maps(
        page_chars, (s, s), tile=config.gaussian_tile
    )
    regression: List[CharRegression] = []
    for polys in page_chars:
        if polys:
            corners = np.stack([p.np_xy[:4] for p in polys])
            centers = corners.mean(axis=1)
            regression.append(char_regression_encodings(corners, centers))
        else:
            empty = np.zeros((0, 4, 2))
            regression.append(char_regression_encodings(
                empty, np.zeros((0, 2))
            ))

    # ------------------------------------------------------------------
    # Crops (page_text_region_cropping.py windows, device extraction).
    # ------------------------------------------------------------------
    crop_images = crop_gaussians = crop_active = crop_page_ids = None
    if config.num_crops_per_page > 0 and s >= config.crop_size:
        c = config.crop_size
        sids, ups, lefts = [], [], []
        for page_idx in range(num_pages):
            for _ in range(config.num_crops_per_page):
                if not region_boxes[page_idx]:
                    continue
                anchor = region_boxes[page_idx][
                    int(rng.integers(0, len(region_boxes[page_idx])))
                ]
                cy = (anchor.up + anchor.down) // 2
                cx = (anchor.left + anchor.right) // 2
                up = int(np.clip(
                    cy - c // 2 + int(rng.integers(-c // 4, c // 4 + 1)),
                    0, s - c,
                ))
                left = int(np.clip(
                    cx - c // 2 + int(rng.integers(-c // 4, c // 4 + 1)),
                    0, s - c,
                ))
                sids.append(page_idx)
                ups.append(up)
                lefts.append(left)
        if sids:
            count = len(sids)
            bucket = 8
            while bucket < count:
                bucket *= 2
            pad = bucket - count

            def _pad(arr):
                a = np.asarray(arr, np.int32)
                return jnp.asarray(np.concatenate([a, np.repeat(a[:1], pad)]))

            imgs, labs, acts = _extract_crops_program(
                jnp.asarray(images),
                jnp.asarray(gaussians[..., None]),
                jnp.asarray(active),
                _pad(sids), _pad(ups), _pad(lefts), size=c,
            )
            crop_images = np.asarray(imgs)[:count]
            crop_gaussians = np.asarray(labs)[:count, ..., 0]
            crop_active = np.asarray(acts)[:count]
            crop_page_ids = np.asarray(sids, np.int32)

    return RegionBatchResult(
        images=images,
        active_masks=active,
        gaussian_maps=gaussians,
        region_boxes=region_boxes,
        char_polygons=page_chars,
        regression=regression,
        crop_images=crop_images,
        crop_gaussians=crop_gaussians,
        crop_active=crop_active,
        crop_page_ids=crop_page_ids,
    )
