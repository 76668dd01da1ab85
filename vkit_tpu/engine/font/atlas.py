"""Glyph atlas + layout-only text lines for device compositing.

The host renderer (pil_font.py) rasterizes every glyph on every call and
paints lines pixel-by-pixel on the CPU.  This module is the TPU-first
split of the same capability (ref behavior: vkit/engine/font/
freetype.py:383-493 placement + page_assembler text-line alpha fill):

  - `GlyphAtlas` rasterizes each distinct (font file, size, char) ONCE and
    keeps the alpha bitmaps as uniform fixed-size tiles — the texture the
    device compositor (ops/glyph.py) samples from;
  - `plan_text_line_layout` runs the SAME layout math as the host engine
    (glyph metrics, kerning limits, random spacing, cross-axis fit,
    overflow trim) but skips all painting, returning char boxes identical
    to the host path for the same rng stream;
  - `placements_for_text_lines` flattens a batch of laid-out lines into the
    compositor's placement table, so a whole page batch's text renders as
    ONE device program.

Residual-glyph cleanup note: the host path paints the whole line first and
must erase pixels of a trimmed char that bled into the kept span
(pil_font._erase_residual_glyph).  The device path simply never places
trimmed chars, which yields the same result by construction.
"""
import functools
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ...element import Box
from ...utility.opt import sample_resize_interpolation
from .pil_font import (
    _find_last_fitting_char,
    compute_char_boxes_hori,
    compute_char_boxes_vert,
    estimate_font_size,
    get_kerning_limits_hori_default,
    load_pil_font,
)
from .type import (
    CharBox,
    CharGlyph,
    FontEngineRunConfig,
    FontEngineRunConfigGlyphSequence,
    TextLine,
)


class GlyphAtlas:
    """Per-(font file, ttc index, size, gamma, engine) glyph cache.

    Tiles are (V, T, T) float32 alpha in [0, 1] — the glyph ScoreMap the
    host path fills through (alpha = (ink/255)^gamma), zero-padded to the
    running max glyph extent T.
    """

    def __init__(self, font, render_char_glyph, run_config_template):
        self._font = font
        self._render_char_glyph = render_char_glyph
        self._template = run_config_template
        self._char_to_id: Dict[str, int] = {}
        self._glyphs: List[CharGlyph] = []
        self._tiles: Optional[np.ndarray] = None
        self._tile_size = 0
        # synthesize_stream's producer thread grows the atlas while the
        # consumer packs tiles; all growth and tile builds serialize on
        # this lock so packs see a consistent (num_glyphs, tiles) state.
        self._lock = threading.RLock()

    def glyph_id(self, char: str) -> int:
        existing = self._char_to_id.get(char)
        if existing is not None:
            return existing
        with self._lock:
            existing = self._char_to_id.get(char)
            if existing is not None:
                return existing
            glyph = self._render_char_glyph(self._template, self._font, char)
            assert glyph.score_map is not None, (
                'device compositing needs scalar-alpha glyphs '
                '(default/monochrome engines); LCD glyphs are 3-channel'
            )
            idx = len(self._glyphs)
            self._glyphs.append(glyph)
            self._tile_size = max(self._tile_size, glyph.height, glyph.width)
            self._tiles = None
            # Publish the id LAST: a concurrent reader that sees the id in
            # _char_to_id also sees the glyph appended.
            self._char_to_id[char] = idx
        return idx

    def snapshot(self) -> Tuple[int, int, np.ndarray]:
        """(num_glyphs, tile_size, tiles) captured atomically w.r.t.
        concurrent glyph_id growth."""
        with self._lock:
            return len(self._glyphs), self._tile_size, self.tiles

    def glyph(self, char: str) -> CharGlyph:
        return self._glyphs[self.glyph_id(char)]

    def glyphs_for(self, chars: Sequence[str]) -> List[CharGlyph]:
        return [self.glyph(char) for char in chars]

    @property
    def num_glyphs(self) -> int:
        return len(self._glyphs)

    @property
    def tile_size(self) -> int:
        return self._tile_size

    @property
    def tiles(self) -> np.ndarray:
        """(V, T, T) float32; rebuilt lazily after new chars arrive."""
        if self._tiles is None:
            with self._lock:
                t = self._tile_size
                tiles = np.zeros(
                    (len(self._glyphs), t, t), dtype=np.float32
                )
                for idx, glyph in enumerate(self._glyphs):
                    assert glyph.score_map is not None
                    alpha = glyph.score_map.mat
                    tiles[idx, :alpha.shape[0], :alpha.shape[1]] = alpha
                self._tiles = tiles
        return self._tiles


_ATLAS_CACHE: Dict[Tuple, GlyphAtlas] = {}


def get_glyph_atlas(
    run_config: FontEngineRunConfig,
    engine: str = 'default',
) -> GlyphAtlas:
    """The cached atlas for this run config's font file / size / gamma."""
    from .pil_font import (
        FontFreetypeDefaultEngine,
        FontFreetypeMonochromeEngine,
    )

    engine_cls = {
        'default': FontFreetypeDefaultEngine,
        'monochrome': FontFreetypeMonochromeEngine,
    }[engine]

    variant = run_config.font_variant
    key = (
        str(variant.font_file),
        variant.ttc_font_index if variant.is_ttc else 0,
        estimate_font_size(run_config),
        run_config.style.glyph_color_gamma,
        engine,
    )
    atlas = _ATLAS_CACHE.get(key)
    if atlas is None:
        atlas = GlyphAtlas(
            font=load_pil_font(run_config),
            render_char_glyph=engine_cls.render_char_glyph,
            run_config_template=run_config,
        )
        _ATLAS_CACHE[key] = atlas
    return atlas


@attr.define
class TextLineLayout:
    """A laid-out text line: everything the device compositor needs, plus
    the char boxes the label pipeline consumes (identical to the host
    TextLine.char_boxes for the same rng stream)."""
    char_boxes: Sequence[CharBox]     # final, line-local coordinates
    glyph_ids: Sequence[int]          # atlas ids, one per kept char
    src_hs: Sequence[int]             # native glyph extents in the tile
    src_ws: Sequence[int]
    height: int                       # final line canvas shape
    width: int
    font_size: int
    text: str
    is_hori: bool


def _collect_glyphs(atlas: GlyphAtlas, chars: Sequence[str]):
    """Atlas-backed twin of pil_font.render_char_glyphs_from_text."""
    glyphs: List[CharGlyph] = []
    glyph_ids: List[int] = []
    preceding: List[int] = []
    pending = 0
    for idx, char in enumerate(chars):
        if char.isspace():
            if idx == 0:
                raise RuntimeError('leading space')
            pending += 1
            continue
        glyph_ids.append(atlas.glyph_id(char))
        glyphs.append(atlas.glyph(char))
        preceding.append(pending)
        pending = 0
    if pending:
        raise RuntimeError('trailing space')
    return glyphs, glyph_ids, preceding


def _fit_and_trim_geometry(
    run_config: FontEngineRunConfig,
    char_boxes: List[CharBox],
    line_h: int,
    line_w: int,
    is_hori: bool,
):
    """Geometry-only mirror of pil_font._fit_cross_axis + overflow trim."""
    target = run_config.height if is_hori else run_config.width
    current = line_h if is_hori else line_w
    too_small = current / target < 0.8
    too_large = current > target

    # Both rescale and pad adjust every box; accumulate the coordinate
    # updates in one array and construct the final CharBox list once.
    ys = xs = None
    if too_small or too_large:
        from ...element.blend import scaled_shape
        rh, rw = scaled_shape(
            line_h, line_w,
            new_height=target if is_hori else None,
            new_width=None if is_hori else target,
        )
        # Vectorized conducted resize: the scale factors are constant
        # across the line, so one clip/round over all boxes replaces a
        # per-char Box.to_conducted_resized_box chain.  Op order matches
        # the scalar path (val * new_size / size, clamp, banker's round).
        # (N, 4): up, down, left, right.  Filled per-field: np.array on a
        # list of NamedTuples takes the generic sequence protocol (~400us
        # per line here).
        coords = np.empty((len(char_boxes), 4), dtype=np.float64)
        for i, cb in enumerate(char_boxes):
            b = cb.box
            coords[i, 0] = b.up
            coords[i, 1] = b.down
            coords[i, 2] = b.left
            coords[i, 3] = b.right
        ys = np.round(np.clip(coords[:, :2] * rh / line_h, 0, rh - 1)).astype(np.int64)
        xs = np.round(np.clip(coords[:, 2:] * rw / line_w, 0, rw - 1)).astype(np.int64)
        line_h, line_w = rh, rw

    current = line_h if is_hori else line_w
    if current != target:
        pad = target - current
        assert pad > 0
        pad_lo = pad // 2
        if ys is None:
            ys = np.empty((len(char_boxes), 2), dtype=np.int64)
            xs = np.empty((len(char_boxes), 2), dtype=np.int64)
            for i, cb in enumerate(char_boxes):
                b = cb.box
                ys[i, 0] = b.up
                ys[i, 1] = b.down
                xs[i, 0] = b.left
                xs[i, 1] = b.right
        if is_hori:
            ys += pad_lo
            line_h = target
        else:
            xs += pad_lo
            line_w = target

    if ys is not None:
        char_boxes = [
            CharBox(cb.char, Box(int(ys[i, 0]), int(ys[i, 1]),
                                 int(xs[i, 0]), int(xs[i, 1])))
            for i, cb in enumerate(char_boxes)
        ]

    limit = run_config.width if is_hori else run_config.height
    extent = line_w if is_hori else line_h
    if extent > limit:
        last_idx = _find_last_fitting_char(char_boxes, limit, is_hori)
        if last_idx < 0:
            return None
        char_boxes = char_boxes[:last_idx + 1]
        edge = (
            char_boxes[-1].right if is_hori else char_boxes[-1].down
        )
        if is_hori:
            line_w = edge + 1
        else:
            line_h = edge + 1

    return char_boxes, line_h, line_w


def plan_text_line_layout(
    run_config: FontEngineRunConfig,
    rng: RandomGenerator,
    atlas: Optional[GlyphAtlas] = None,
    engine: str = 'default',
) -> Optional[TextLineLayout]:
    """Lay out one text line without painting a pixel.

    Consumes the rng in the same order as the host renderer
    (pil_font._run_renderer -> render_text_line_meta), so char boxes match
    the host TextLine exactly for the same stream.
    """
    if atlas is None:
        atlas = get_glyph_atlas(run_config, engine=engine)

    # The host path draws the two resize interpolations before layout;
    # consume them to keep streams aligned (the device path's per-glyph
    # tap-matmul resampling is bilinear regardless).
    sample_resize_interpolation(rng)
    sample_resize_interpolation(rng, include_area=True)

    glyphs, glyph_ids, preceding = _collect_glyphs(atlas, run_config.chars)
    if not glyphs:
        return None

    is_hori = (
        run_config.glyph_sequence == FontEngineRunConfigGlyphSequence.HORI_DEFAULT
    )
    if is_hori:
        kerning = get_kerning_limits_hori_default(glyphs, preceding)
        char_boxes, line_h, line_w = compute_char_boxes_hori(
            run_config.style, glyphs, preceding, kerning, rng
        )
    else:
        char_boxes, line_h, line_w = compute_char_boxes_vert(
            run_config.style, glyphs, preceding, rng
        )

    fitted = _fit_and_trim_geometry(run_config, list(char_boxes),
                                    line_h, line_w, is_hori)
    if fitted is None:
        return None
    char_boxes, line_h, line_w = fitted

    kept = len(char_boxes)
    char_idx = 0
    count = 0
    while char_idx < len(run_config.chars) and count < kept:
        if not run_config.chars[char_idx].isspace():
            count += 1
        char_idx += 1

    return TextLineLayout(
        char_boxes=char_boxes,
        glyph_ids=glyph_ids[:kept],
        src_hs=[g.height for g in glyphs[:kept]],
        src_ws=[g.width for g in glyphs[:kept]],
        height=line_h,
        width=line_w,
        font_size=estimate_font_size(run_config),
        text=''.join(run_config.chars[:char_idx]),
        is_hori=is_hori,
    )


def layout_to_text_line(
    layout: TextLineLayout,
    atlas: GlyphAtlas,
    style,
    chars: Sequence[str],
):
    """Bridge a layout into a real TextLine with blank rasters.

    The label pipeline's geometry helpers (split / to_polygon /
    to_char_polygons / get_height_points) read only boxes, glyphs and the
    main axis — never pixels — so a TextLine whose rasters are lazy zero
    pages serves them at negligible cost.  The actual pixels live on the
    device via the glyph compositor.
    """
    from ...element import Image, Mask
    from ...ops.resize import Interpolation

    image = Image.from_shape((layout.height, layout.width),
                             num_channels=3, value=255)
    mask = Mask.from_shape((layout.height, layout.width))
    anchor = Box.from_shapable(image)
    glyphs = [atlas._glyphs[gid] for gid in layout.glyph_ids]
    return TextLine(
        image=image.to_box_attached(anchor),
        mask=mask.to_box_attached(anchor),
        score_map=None,
        char_boxes=list(layout.char_boxes),
        char_glyphs=glyphs,
        resize_interpolation=Interpolation.LINEAR,
        style=style,
        font_size=layout.font_size,
        text=layout.text,
        is_hori=layout.is_hori,
    )


class AtlasPack:
    """Batch-level union of glyph atlases (mixed fonts/sizes): remaps each
    atlas's local glyph ids into one tile array for a single compositor
    call."""

    def __init__(self):
        self._atlases: List[GlyphAtlas] = []
        self._atlas_index: Dict[int, int] = {}
        self._offsets: List[int] = []

    def _atlas_slot(self, atlas: GlyphAtlas) -> int:
        slot = self._atlas_index.get(id(atlas))
        if slot is None:
            slot = len(self._atlases)
            self._atlas_index[id(atlas)] = slot
            self._atlases.append(atlas)
        return slot

    def global_id(self, atlas: GlyphAtlas, local_id: int) -> Tuple[int, int]:
        """Returns (slot, local_id); resolve to a flat id at tiles() time
        (atlases may still be growing while entries accumulate)."""
        return (self._atlas_slot(atlas), local_id)

    # Sparse tile-size rungs: T is part of the compositor's compiled
    # signature, and 8-multiples recompiled it (a ~30 s tunnel round trip
    # per program) whenever a slightly larger glyph first appeared.
    _TILE_RUNGS = (16, 24, 32, 48, 64, 96, 128, 192, 256)

    def tiles_and_resolver(self):
        """Build the combined (V, T, T) tile array; returns it plus a
        resolver mapping (slot, local_id) -> flat tile index.

        The built array (and, via ``device_tiles_and_resolver``, its
        device copy) is CACHED against the pack's growth state: repeat
        calls while no atlas grew are free."""
        if not self._atlases:
            return np.zeros((1, 1, 1), dtype=np.float32), lambda key: 0
        # Per-atlas ATOMIC snapshots: synthesize_stream's producer thread
        # may grow an atlas concurrently; offsets and tile copies must see
        # one consistent (num_glyphs, tiles) pair per atlas.
        snaps = [a.snapshot() for a in self._atlases]
        state = tuple((n, t) for n, t, _ in snaps)
        cached = getattr(self, '_build_cache', None)
        if cached is not None and cached[0] == state:
            return cached[1], cached[2]
        t_need = max(s[1] for s in snaps)
        tile = next(
            (r for r in self._TILE_RUNGS if t_need <= r),
            -(-t_need // 256) * 256,
        )
        offsets = []
        total = 0
        for num_glyphs, _, _ in snaps:
            offsets.append(total)
            total += num_glyphs
        # Next power of two (min 64): the tile-stack length is part of the
        # compositor's compiled signature, and rounding to 64-multiples
        # recompiled composite_glyphs nearly every batch while the atlas
        # grew — powers of two reach a stable shape after a few batches.
        padded = 64
        while padded < total:
            padded *= 2
        total = padded
        tiles = np.zeros((total, tile, tile), dtype=np.float32)
        for (_, _, src), off in zip(snaps, offsets):
            tiles[off:off + src.shape[0], :src.shape[1], :src.shape[2]] = src
        resolver = (lambda key: offsets[key[0]] + key[1])
        self._build_cache = (state, tiles, resolver)
        self._device_cache = None
        return tiles, resolver

    def device_tiles_and_resolver(self):
        """The device tile buffer + id resolver, with a STABLE compiled
        signature under atlas growth.

        The buffer shape is part of the glyph compositor's compiled
        signature, and naive per-batch rebuilds recompiled it (~30 s per
        program over the tunnel) whenever any atlas saw a new char or a
        bigger glyph.  Here each atlas owns a pow2 CAPACITY SLAB inside a
        fixed (V_cap, T, T) device buffer; new glyphs stream in as DELTA
        `.at[slab].set` updates (uploading only the new tiles), and the
        buffer is rebuilt — the only recompile — when a slab overflows,
        a new atlas arrives past V_cap, or a glyph outgrows the T rung.
        """
        import jax.numpy as jnp

        if not hasattr(self, '_dev'):
            self._dev = None
            self._slab_off: List[int] = []
            self._slab_cap: List[int] = []
            self._copied: List[int] = []
            self._tile_rung = 0
            self._v_cap = 0

        if not self._atlases:
            if self._dev is None:
                self._dev = jnp.zeros((1, 1, 1), dtype=jnp.float32)
            return self._dev, lambda key: 0

        snaps = [a.snapshot() for a in self._atlases]
        t_need = max(s[1] for s in snaps)
        rung = next(
            (r for r in self._TILE_RUNGS if t_need <= r),
            -(-t_need // 256) * 256,
        )
        rung = max(rung, self._tile_rung)

        rebuild = (
            self._dev is None
            or rung > self._tile_rung
            or len(snaps) > len(self._slab_off)
            or any(n > cap for (n, _, _), cap
                   in zip(snaps, self._slab_cap))
        )
        if rebuild:
            caps, offs, total = [], [], 0
            for n, _, _ in snaps:
                cap = 64
                while cap < n:
                    cap *= 2
                offs.append(total)
                caps.append(cap)
                total += cap
            v_cap = max(self._v_cap, 2048)
            while v_cap < total:
                v_cap *= 2
            host = np.zeros((v_cap, rung, rung), dtype=np.float32)
            for (n, _, src), off in zip(snaps, offs):
                host[off:off + n, :src.shape[1], :src.shape[2]] = src
            self._dev = jnp.asarray(host)
            self._slab_off, self._slab_cap = offs, caps
            self._copied = [n for n, _, _ in snaps]
            self._tile_rung, self._v_cap = rung, v_cap
        else:
            for i, (n, _, src) in enumerate(snaps):
                done = self._copied[i]
                if n > done:
                    delta = np.zeros((n - done, rung, rung), np.float32)
                    delta[:, :src.shape[1], :src.shape[2]] = src[done:n]
                    off = self._slab_off[i]
                    self._dev = self._dev.at[off + done:off + n].set(
                        jnp.asarray(delta)
                    )
                    self._copied[i] = n
        offs = self._slab_off
        return self._dev, (lambda key: offs[key[0]] + key[1])


_GLOBAL_PACK: Optional[AtlasPack] = None


def global_atlas_pack() -> AtlasPack:
    """The process-wide AtlasPack.

    The pack's tile-array SHAPE is part of the glyph compositor's
    compiled signature; a per-batch pack saw only that batch's fonts, so
    the shape (and the compiled program, ~30 s each over the tunnel)
    bounced between batches.  One global pack accumulates every atlas
    the process ever touches: the shape grows monotonically through
    sparse rungs and stabilizes, after which batches share one program
    and one device-resident tile upload."""
    global _GLOBAL_PACK
    if _GLOBAL_PACK is None:
        _GLOBAL_PACK = AtlasPack()
    return _GLOBAL_PACK


def _quantize_out_tile(max_extent: int) -> int:
    """Static compositor patch size: sparse ladder (each value is a
    distinct compiled program; 32-multiples recompiled per random draw)."""
    for t in (32, 64, 128, 256, 512):
        if max_extent <= t:
            return t
    return -(-max_extent // 512) * 512


def pack_placements(
    entries: Sequence[Tuple[TextLineLayout, Tuple[int, int], int,
                            Tuple[int, int, int], GlyphAtlas]],
    pack: AtlasPack,
    bucket: int = 256,
):
    """Multi-atlas variant of placements_for_text_lines: entries carry the
    atlas each layout's glyph ids index into."""
    from ...ops.glyph import build_placements

    keyed_rows = []
    max_extent = 1
    for layout, (page_up, page_left), sample_id, color, atlas in entries:
        for cb, gid, src_h, src_w in zip(
            layout.char_boxes, layout.glyph_ids,
            layout.src_hs, layout.src_ws,
        ):
            keyed_rows.append((pack.global_id(atlas, gid), {
                'sample_id': sample_id,
                'up': page_up + cb.up,
                'left': page_left + cb.left,
                'dst_h': cb.height,
                'dst_w': cb.width,
                'src_h': float(src_h),
                'src_w': float(src_w),
                'color': np.asarray(color, dtype=np.float32),
            }))
            max_extent = max(max_extent, cb.height, cb.width)

    tiles, resolve = pack.device_tiles_and_resolver()
    rows = []
    for key, row in keyed_rows:
        row['glyph_id'] = resolve(key)
        rows.append(row)

    out_tile = _quantize_out_tile(max_extent)
    return build_placements(rows, num_channels=3, bucket=bucket), tiles, out_tile


def placements_for_text_lines(
    entries: Sequence[Tuple[TextLineLayout, Tuple[int, int], int, Tuple[int, int, int]]],
    bucket: int = 256,
):
    """Flatten (layout, (page_up, page_left), sample_id, color) entries into
    the compositor's placement table.

    Returns (GlyphPlacements, out_tile) — out_tile is the static patch size
    covering the largest destination box, rounded up to a multiple of 32 so
    compile count stays bounded across batches.
    """
    from ...ops.glyph import build_placements

    rows = []
    max_extent = 1
    for layout, (page_up, page_left), sample_id, color in entries:
        for cb, gid, src_h, src_w in zip(
            layout.char_boxes, layout.glyph_ids,
            layout.src_hs, layout.src_ws,
        ):
            rows.append({
                'glyph_id': gid,
                'sample_id': sample_id,
                'up': page_up + cb.up,
                'left': page_left + cb.left,
                'dst_h': cb.height,
                'dst_w': cb.width,
                'src_h': float(src_h),
                'src_w': float(src_w),
                'color': np.asarray(color, dtype=np.float32),
            })
            max_extent = max(max_extent, cb.height, cb.width)

    out_tile = _quantize_out_tile(max_extent)
    return build_placements(rows, num_channels=3, bucket=bucket), out_tile
