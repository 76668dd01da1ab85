"""The batched device synthesis program: assemble -> distort -> label ->
resize for a page batch.

Pipeline (per batch of N host-prepped pages):
  1. assemble    — glyph compositing onto the background canvases
                   (ops/glyph.py, one scan program).
  2. photometric — randomized policy rounds over the full batch
                   (mechanism/batched_random.py, gated device programs).
  3. geometric   — one randomized WarpPlan per sample; ONE dense two-pass
                   MXU warp moves the image AND the 4 label channels
                   together (mechanism/batched.batched_plan_warp).
  4. label fix   — the warped height channels are rescaled by the local
                   vertical stretch of the backward field (the device twin
                   of the reference recomputing heights from warped point
                   pairs, vkit/pipeline/text_detection/
                   page_distortion.py:163-223).
  5. resize      — tap-matmul resize of every channel to the static output
                   shape (the page_resizing step's dense work).

Label polygons co-transform analytically on the host (WarpPlan forward
point maps) — cheap, and exactly what the reference's point path computes.
"""
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from numpy.random import Generator as RandomGenerator

from ..element import Box, Polygon
from ..engine.font.atlas import AtlasPack, pack_placements
from ..mechanism.batched import batched_plan_warp
from ..mechanism.batched_random import (
    batch_random_photometric_distort,
    sample_geometric_plans,
)
from ..ops.glyph import build_placements, composite_glyphs, composite_patches
from .prep import CHAR_HEIGHT, HostPage, TEXT_LINE_HEIGHT


_OVERLAY_TILE_LADDER = (64, 128, 192, 256, 384, 512)


def _composite_overlays(assembled, overlay):
    """Blend the ABOVE-TEXT page layers (symbols, seal stamps) in one
    device scan program (ops/glyph.composite_patches).  ``overlay``:
    [(sample_id, OverlayEntry)] in z-order."""
    overlay = [
        (sid, e) for sid, e in overlay
        if max(e.alpha.shape) <= _OVERLAY_TILE_LADDER[-1]
    ]
    if not overlay:
        return assembled
    max_dim = max(max(e.alpha.shape) for _, e in overlay)
    tile = next(t for t in _OVERLAY_TILE_LADDER if t >= max_dim)
    count = len(overlay)
    bucket = 8
    while bucket < count:
        bucket *= 2

    tiles_a = np.zeros((bucket, tile, tile), dtype=np.float32)
    tiles_rgb = np.zeros((bucket, tile, tile, 3), dtype=np.float32)
    rows = []
    use_rgbs = np.zeros(bucket, dtype=np.float32)
    for i, (sid, e) in enumerate(overlay):
        h, w = e.alpha.shape
        tiles_a[i, :h, :w] = e.alpha
        if e.rgb is not None:
            tiles_rgb[i, :h, :w] = e.rgb
            use_rgbs[i] = 1.0
        rows.append({
            'glyph_id': i, 'sample_id': sid, 'up': e.up, 'left': e.left,
            'dst_h': h, 'dst_w': w, 'src_h': float(h), 'src_w': float(w),
            'color': np.asarray(e.color, dtype=np.float32),
        })
    placements = build_placements(rows, bucket=bucket)
    return composite_patches(
        assembled, tiles_a, tiles_rgb, use_rgbs, placements, out_tile=tile
    )


class SynthBatchResult(NamedTuple):
    images: np.ndarray          # (N, out_h, out_w, 3) uint8
    label_stack: np.ndarray     # (N, out_h, out_w, 4) float32 (see prep.py)
    active_masks: np.ndarray    # (N, out_h, out_w) uint8
    content_boxes: Sequence[Box]          # per-sample active bounding boxes
    word_polygons: Sequence[List[Polygon]]   # co-transformed, out coords
    char_polygons: Sequence[List[Polygon]]


@jax.jit
def _finish_program_const(stack, stretches, active):
    """Finish variant for all-affine batches: the local vertical stretch
    is a per-sample constant derived analytically from the matrices, so
    no dense maps ever materialize."""
    x = stack.astype(jnp.float32)
    stretch = stretches[:, None, None]
    x = x.at[..., 3 + TEXT_LINE_HEIGHT].multiply(stretch)
    x = x.at[..., 3 + CHAR_HEIGHT].multiply(stretch)
    gate = (active > 0.5).astype(jnp.float32)[..., None]
    x = x * gate
    images = jnp.clip(jnp.round(x[..., :3]), 0, 255).astype(jnp.uint8)
    return images, x[..., 3:], (active > 0.5).astype(jnp.uint8)


def _affine_stretches(plans) -> np.ndarray:
    """Per-sample constant vertical stretch of affine/nop plans: the
    inverse of how many source pixels one dst row step covers."""
    out = np.ones(len(plans), dtype=np.float32)
    for i, plan in enumerate(plans):
        if plan.matrix is None:
            continue
        mat3 = np.eye(3, dtype=np.float64)
        m = np.asarray(plan.matrix, dtype=np.float64)
        mat3[:m.shape[0]] = m
        inv = np.linalg.inv(mat3)
        step = float(np.hypot(inv[0, 1], inv[1, 1]))
        out[i] = 1.0 / max(step, 1e-3)
    return np.clip(out, 0.05, 20.0)


@jax.jit
def _finish_program(stack, map_ys, map_xs, active):
    """Height-channel correction by the warp's local vertical stretch.

    The backward field maps dst->src, so a dst step of 1 px covers
    ||d(src)/d(dst_y)|| source pixels; content rendered there stretched by
    the inverse.  Because the final resize is folded into the plans
    (rescale_plan_to), the stretch carries the resize ratio too — this is
    the device twin of the reference recomputing heights from warped point
    pairs and then rescaling them with the page.
    """
    x = stack.astype(jnp.float32)
    dmy = jnp.diff(map_ys, axis=1, append=map_ys[:, -1:, :])
    dmx = jnp.diff(map_xs, axis=1, append=map_xs[:, -1:, :])
    step = jnp.sqrt(dmy * dmy + dmx * dmx)
    stretch = jnp.clip(1.0 / jnp.maximum(step, 1e-3), 0.05, 20.0)

    x = x.at[..., 3 + TEXT_LINE_HEIGHT].multiply(stretch)
    x = x.at[..., 3 + CHAR_HEIGHT].multiply(stretch)

    # The warp extends its backward maps smoothly past the projected
    # border (tap-budget discipline); the active mask restores border
    # semantics outside the content region.
    gate = (active > 0.5).astype(jnp.float32)[..., None]
    x = x * gate
    images = jnp.clip(jnp.round(x[..., :3]), 0, 255).astype(jnp.uint8)
    labels = x[..., 3:]
    active_u8 = (active > 0.5).astype(jnp.uint8)
    return images, labels, active_u8


def synthesize_page_batch(
    pages: Sequence[HostPage],
    level: int,
    rng: RandomGenerator,
    key=None,
    out_shape: Optional[Tuple[int, int]] = None,
    enable_photometric: bool = True,
    enable_geometric: bool = True,
    placement_bucket: int = 1024,
) -> SynthBatchResult:
    """Run the device synthesis program over N host-prepped pages.

    ``out_shape`` (default: the page shape) is the STATIC output canvas;
    every randomized geometric draw folds its resize into the warp plan so
    one compiled program serves all batches.
    """
    from ..mechanism.distortion.warp_plan import (
        nop_plan,
        rescale_plan_to,
        warp_active_mask,
    )
    from ..utility import enable_compilation_cache

    enable_compilation_cache()

    n = len(pages)
    assert n > 0
    height, width = pages[0].background.shape[:2]
    assert all(p.background.shape[:2] == (height, width) for p in pages)

    # 1. Assemble: glyph compositing, one program for the whole batch.
    base = np.stack([p.background for p in pages])
    pack = AtlasPack()
    entries = []
    for sample_id, page in enumerate(pages):
        for layout, anchor, color, atlas in page.line_entries:
            entries.append((layout, anchor, sample_id, color, atlas))
    if entries:
        placements, tiles, out_tile = pack_placements(
            entries, pack, bucket=placement_bucket
        )
        assembled = composite_glyphs(base, tiles, placements,
                                     out_tile=out_tile)
    else:
        assembled = jnp.asarray(base)

    # Above-text layers (non-text symbols, seal stamps) ride a second
    # scan program in z-order (page_assembler.py: text <- symbols <-
    # seals).
    overlay = [
        (sample_id, entry)
        for sample_id, page in enumerate(pages)
        for entry in page.overlay_entries
    ]
    if overlay:
        assembled = _composite_overlays(assembled, overlay)

    # 2. Photometric stage (policy-sampled, gated device rounds).
    if enable_photometric:
        assembled = batch_random_photometric_distort(
            assembled, level, rng, key=key
        )

    # 3. Geometric stage: one dense warp moves image + labels together.
    # The final resize folds INTO each plan (rescale_plan_to), so every
    # sample's randomized warp lands on the one static output canvas in a
    # single resampling pass — one compiled program for every batch.
    out_shape = out_shape or (height, width)
    if enable_geometric:
        raw_plans = sample_geometric_plans(n, (height, width), level, rng)
    else:
        raw_plans = [nop_plan((height, width)) for _ in range(n)]
    plans = [rescale_plan_to(p, out_shape) for p in raw_plans]

    labels = np.stack([p.label_stack for p in pages])
    stack = jnp.concatenate(
        [assembled.astype(jnp.float32), jnp.asarray(labels)], axis=-1
    )
    warped, shapes, _, maps = batched_plan_warp(
        plans, stack, return_maps=True, mode='auto'
    )
    assert warped.shape[1:3] == out_shape

    active = np.zeros((n,) + out_shape, dtype=np.float32)
    for idx, plan in enumerate(plans):
        active[idx] = warp_active_mask(plan).mat

    # 4. Height correction, one jitted program.
    if maps is None:
        images, label_stack, active_u8 = _finish_program_const(
            warped,
            jnp.asarray(_affine_stretches(plans)),
            jnp.asarray(active),
        )
    else:
        map_ys, map_xs = maps
        images, label_stack, active_u8 = _finish_program(
            warped,
            jnp.asarray(map_ys, dtype=jnp.float32),
            jnp.asarray(map_xs, dtype=jnp.float32),
            jnp.asarray(active),
        )

    # Host: analytic polygon co-transform + content boxes (the reference's
    # corner-point trim folded into per-sample boxes; the rescaled plans
    # already map into output coordinates).
    images_np = np.asarray(images)
    label_np = np.asarray(label_stack)
    active_np = np.asarray(active_u8)

    word_polygons: List[List[Polygon]] = []
    char_polygons: List[List[Polygon]] = []
    content_boxes: List[Box] = []
    for idx, (plan, page) in enumerate(zip(plans, pages)):
        def transform(polygons):
            return [
                Polygon.from_np_array(plan.map_points(p.to_np_array()))
                for p in polygons
            ]

        word_polygons.append(transform(page.word_polygons))
        char_polygons.append(transform(page.char_polygons))

        row_any = active_np[idx].any(axis=1)
        col_any = active_np[idx].any(axis=0)
        if row_any.any():
            rows = np.flatnonzero(row_any)
            cols = np.flatnonzero(col_any)
            content_boxes.append(
                Box(int(rows[0]), int(rows[-1]), int(cols[0]), int(cols[-1]))
            )
        else:
            content_boxes.append(
                Box(0, out_shape[0] - 1, 0, out_shape[1] - 1)
            )

    return SynthBatchResult(
        images=images_np,
        label_stack=label_np,
        active_masks=active_np,
        content_boxes=content_boxes,
        word_polygons=word_polygons,
        char_polygons=char_polygons,
    )


def synthesize_stream(
    planner,
    batch_size: int,
    level: int,
    rng: RandomGenerator,
    num_batches: int,
    out_shape: Optional[Tuple[int, int]] = None,
    prefetch: int = 2,
):
    """Generator of SynthBatchResults with host prep overlapped against
    device work: a background thread keeps up to ``prefetch`` prepared
    page batches queued (layout sampling, atlas text lines, label
    rasters) while the device program drains the previous batch — the
    prefetch-pump structure of parallel/prefetch.py applied to the synth
    pipeline (replaces the reference's inventory-backpressure pool,
    vkit/utility/pool.py:153-243, for this path)."""
    import queue
    import threading

    prep_queue: 'queue.Queue' = queue.Queue(maxsize=max(prefetch, 1))
    # Host sampling must stay deterministic given rng: draw per-batch
    # child seeds up front, in order.
    seeds = [int(rng.integers(0, 2**63 - 1)) for _ in range(num_batches)]
    level_rngs = [np.random.default_rng(seed) for seed in seeds]

    def producer():
        # A producer crash must SURFACE in the consumer, not strand it on
        # queue.get() forever (the reference's pool propagates worker
        # failures the same way, vkit/utility/pool.py:176-184).
        try:
            for batch_rng in level_rngs:
                prep_queue.put(planner.prepare_batch(batch_size, batch_rng))
        except BaseException as exc:  # noqa: BLE001 - relayed to consumer
            prep_queue.put(exc)
        else:
            prep_queue.put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        idx = 0
        while True:
            pages = prep_queue.get()
            if pages is None:
                break
            if isinstance(pages, BaseException):
                raise pages
            yield synthesize_page_batch(
                pages, level=level, rng=level_rngs[idx],
                out_shape=out_shape,
            )
            idx += 1
    finally:
        thread.join(timeout=1.0)
