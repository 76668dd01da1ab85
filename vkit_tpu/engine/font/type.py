"""Font data model: FontMeta/FontVariant/FontCollection + CharBox/CharGlyph/
TextLine.

Capability parity: vkit/engine/font/type.py:54-755.
"""
import json
import os
from collections import defaultdict
from enum import Enum, unique
from pathlib import Path
from typing import (
    DefaultDict,
    Dict,
    Iterable,
    List,
    Mapping,
    Optional,
    Sequence,
    Set,
    Tuple,
    Union,
)

import attr
import numpy as np

from ...element import (
    Box,
    Image,
    Interpolation,
    Mask,
    Point,
    PointList,
    Polygon,
    ScoreMap,
    Shapable,
)
from ...utility import PathType, dyn_structure


@attr.define(frozen=True)
class FontGlyphInfo:
    tags: Sequence[str]
    ascent_plus_pad_up_min_to_font_size_ratio: float
    height_min_to_font_size_ratio: float
    width_min_to_font_size_ratio: float


@attr.define
class FontGlyphInfoCollection:
    font_glyph_infos: Sequence[FontGlyphInfo]
    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    @property
    def tag_to_font_glyph_info(self) -> Mapping[str, FontGlyphInfo]:
        cached = self._cache.get('tag_to_font_glyph_info')
        if cached is None:
            cached = {}
            for font_glyph_info in self.font_glyph_infos:
                assert font_glyph_info.tags
                for tag in font_glyph_info.tags:
                    assert tag not in cached
                    cached[tag] = font_glyph_info
            self._cache['tag_to_font_glyph_info'] = cached
        return cached


@attr.define
class FontVariant:
    char_to_tags: Mapping[str, Sequence[str]]
    font_file: PathType
    font_glyph_info_collection: FontGlyphInfoCollection
    is_ttc: bool = False
    ttc_font_index: Optional[int] = None


@unique
class FontMode(Enum):
    TTC = 'ttc'     # Single ttc file with multiple variants.
    VTTC = 'vttc'   # Grouped ttf files.
    VOTC = 'votc'   # Grouped otf files.


@attr.define
class FontMeta:
    name: str
    mode: FontMode
    char_to_tags: Mapping[str, Sequence[str]]
    font_files: Sequence[str]
    font_glyph_info_collection: FontGlyphInfoCollection
    # Inclusive.
    ttc_font_index_max: Optional[int] = None
    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    @property
    def chars(self) -> Sequence[str]:
        cached = self._cache.get('chars')
        if cached is None:
            cached = sorted(self.char_to_tags)
            self._cache['chars'] = cached
        return cached

    def __repr__(self):
        return (
            f'FontMeta(name="{self.name}", mode={self.mode}, '
            f'num_chars={len(self.char_to_tags)}, font_files={self.font_files}, '
            f'ttc_font_index_max={self.ttc_font_index_max})'
        )

    @classmethod
    def from_file(
        cls,
        path: PathType,
        font_file_prefix: Optional[PathType] = None,
    ) -> 'FontMeta':
        font = dyn_structure(path, FontMeta, force_path_type=True)
        if font_file_prefix:
            prefix = Path(os.path.expandvars(os.fspath(font_file_prefix)))
            font_files = []
            for font_file in font.font_files:
                resolved = prefix / font_file
                assert resolved.exists()
                font_files.append(str(resolved))
            font = attr.evolve(font, font_files=font_files)
        return font

    def to_file(self, path: PathType, font_file_prefix: Optional[PathType] = None):
        font = self
        if font_file_prefix:
            prefix = Path(os.fspath(font_file_prefix))
            font_files = [
                str(Path(font_file).relative_to(prefix)) for font_file in self.font_files
            ]
            font = attr.evolve(self, font_files=font_files)
        raw = {
            'name': font.name,
            'mode': font.mode.value,
            'char_to_tags': {k: list(v) for k, v in font.char_to_tags.items()},
            'font_files': list(font.font_files),
            'font_glyph_info_collection': {
                'font_glyph_infos': [
                    {
                        'tags': list(info.tags),
                        'ascent_plus_pad_up_min_to_font_size_ratio':
                            info.ascent_plus_pad_up_min_to_font_size_ratio,
                        'height_min_to_font_size_ratio':
                            info.height_min_to_font_size_ratio,
                        'width_min_to_font_size_ratio':
                            info.width_min_to_font_size_ratio,
                    }
                    for info in font.font_glyph_info_collection.font_glyph_infos
                ]
            },
            'ttc_font_index_max': font.ttc_font_index_max,
        }
        with open(os.fspath(path), 'w') as fout:
            json.dump(raw, fout, indent=2, ensure_ascii=False)

    @property
    def num_font_variants(self) -> int:
        if self.mode in (FontMode.VOTC, FontMode.VTTC):
            return len(self.font_files)
        if self.mode == FontMode.TTC:
            assert self.ttc_font_index_max is not None
            return self.ttc_font_index_max + 1
        raise NotImplementedError()

    def get_font_variant(self, variant_idx: int) -> FontVariant:
        if self.mode in (FontMode.VOTC, FontMode.VTTC):
            assert variant_idx < len(self.font_files)
            return FontVariant(
                char_to_tags=self.char_to_tags,
                font_file=self.font_files[variant_idx],
                font_glyph_info_collection=self.font_glyph_info_collection,
            )
        if self.mode == FontMode.TTC:
            assert self.ttc_font_index_max is not None
            assert variant_idx <= self.ttc_font_index_max
            return FontVariant(
                char_to_tags=self.char_to_tags,
                font_file=self.font_files[0],
                font_glyph_info_collection=self.font_glyph_info_collection,
                is_ttc=True,
                ttc_font_index=variant_idx,
            )
        raise NotImplementedError()


class FontCollectionFolderTree:
    FONT = 'font'
    FONT_META = 'font_meta'


@attr.define
class FontCollection:
    font_metas: Sequence[FontMeta]
    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    def _build(self):
        name_to_font_meta: Dict[str, FontMeta] = {}
        char_to_font_meta_names: DefaultDict[str, Set[str]] = defaultdict(set)
        for font_meta in self.font_metas:
            assert font_meta.name not in name_to_font_meta
            name_to_font_meta[font_meta.name] = font_meta
            for char in font_meta.chars:
                char_to_font_meta_names[char].add(font_meta.name)
        self._cache['name_to_font_meta'] = name_to_font_meta
        self._cache['char_to_font_meta_names'] = dict(char_to_font_meta_names)

    @property
    def name_to_font_meta(self) -> Mapping[str, FontMeta]:
        if 'name_to_font_meta' not in self._cache:
            self._build()
        return self._cache['name_to_font_meta']

    @property
    def char_to_font_meta_names(self) -> Mapping[str, Set[str]]:
        if 'char_to_font_meta_names' not in self._cache:
            self._build()
        return self._cache['char_to_font_meta_names']

    def filter_font_metas(self, chars: Iterable[str]) -> List[FontMeta]:
        name_sets = [
            self.char_to_font_meta_names.get(char, set())
            for char in chars if not char.isspace()
        ]
        if not name_sets:
            return list(self.font_metas)
        font_meta_names = sorted(set.intersection(*name_sets))
        return [self.name_to_font_meta[name] for name in font_meta_names]

    @classmethod
    def from_folder(cls, folder: PathType) -> 'FontCollection':
        in_fd = Path(os.path.expandvars(os.fspath(folder)))
        font_fd = in_fd / FontCollectionFolderTree.FONT
        font_meta_fd = in_fd / FontCollectionFolderTree.FONT_META
        font_metas = [
            FontMeta.from_file(font_meta_json, font_fd)
            for font_meta_json in sorted(font_meta_fd.glob('*.json'))
        ]
        return cls(font_metas=font_metas)


@attr.define
class FontEngineRunConfigStyle:
    # Font size.
    font_size_ratio: float = 1.0
    font_size_min: int = 12
    font_size_max: int = 96

    # Space between chars.
    prob_set_char_space_min: float = 0.5
    char_space_min: float = 0.0
    char_space_max: float = 0.2
    char_space_mean: float = 0.1
    char_space_std: float = 0.03

    # Space between words.
    word_space_min: float = 0.3
    word_space_max: float = 1.0
    word_space_mean: float = 0.6
    word_space_std: float = 0.1

    # Effect.
    glyph_color: Tuple[int, int, int] = (0, 0, 0)
    glyph_color_gamma: float = 1.0

    # Renderer options.
    freetype_force_autohint: bool = False


@unique
class FontEngineRunConfigGlyphSequence(Enum):
    HORI_DEFAULT = 'hori_default'
    VERT_DEFAULT = 'vert_default'


@attr.define
class FontEngineRunConfig:
    height: int
    width: int
    chars: Sequence[str]
    font_variant: FontVariant

    glyph_sequence: FontEngineRunConfigGlyphSequence = (
        FontEngineRunConfigGlyphSequence.HORI_DEFAULT
    )
    style: FontEngineRunConfigStyle = attr.field(factory=FontEngineRunConfigStyle)

    # For debugging.
    return_font_variant: bool = False


@attr.define(frozen=True)
class CharBox(Shapable):
    char: str
    box: Box

    def __attrs_post_init__(self):
        assert len(self.char) == 1 and not self.char.isspace()

    @property
    def up(self) -> int:
        return self.box.up

    @property
    def down(self) -> int:
        return self.box.down

    @property
    def left(self) -> int:
        return self.box.left

    @property
    def right(self) -> int:
        return self.box.right

    @property
    def height(self) -> int:
        return self.box.height

    @property
    def width(self) -> int:
        return self.box.width

    def to_conducted_resized_char_box(
        self,
        shapable_or_shape: Union[Shapable, Tuple[int, int]],
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ) -> 'CharBox':
        return attr.evolve(
            self,
            box=self.box.to_conducted_resized_box(
                shapable_or_shape=shapable_or_shape,
                resized_height=resized_height,
                resized_width=resized_width,
            ),
        )

    def to_resized_char_box(
        self,
        resized_height: Optional[int] = None,
        resized_width: Optional[int] = None,
    ) -> 'CharBox':
        return attr.evolve(
            self,
            box=self.box.to_resized_box(
                resized_height=resized_height,
                resized_width=resized_width,
            ),
        )

    def to_shifted_char_box(self, offset_y: int = 0, offset_x: int = 0) -> 'CharBox':
        return attr.evolve(
            self,
            box=self.box.to_shifted_box(offset_y=offset_y, offset_x=offset_x),
        )


@attr.define
class CharGlyph:
    char: str
    image: Image
    score_map: Optional[ScoreMap]
    # Baseline-relative metrics (see build_char_glyph in pil_font.py).
    ascent: int
    pad_up: int
    pad_down: int
    pad_left: int
    pad_right: int
    # Per-tag reference metrics for char polygon expansion.
    ref_ascent_plus_pad_up: int
    ref_char_height: int
    ref_char_width: int

    def __attrs_post_init__(self):
        # ascent may be negative (e.g. '_').
        assert self.pad_up >= 0
        assert self.pad_down >= 0
        assert self.pad_left >= 0
        assert self.pad_right >= 0

    @property
    def height(self) -> int:
        return self.image.height

    @property
    def width(self) -> int:
        return self.image.width

    def get_glyph_mask(
        self,
        box: Optional[Box] = None,
        enable_resize: bool = False,
        interpolation: Interpolation = Interpolation.CUBIC,
    ) -> Mask:
        if self.image.mat.ndim == 2:
            np_mask = self.image.mat > 0
        elif self.image.mat.ndim == 3:
            np_mask = np.any(self.image.mat > 0, axis=2)
        else:
            raise NotImplementedError()

        mask = Mask(mat=np_mask.astype(np.uint8))
        if box:
            if mask.shape != box.shape:
                assert enable_resize
                mask = mask.to_resized_mask(
                    resized_height=box.height,
                    resized_width=box.width,
                    interpolation=interpolation,
                )
            mask = mask.to_box_attached(box)
        return mask


@attr.define
class TextLine:
    image: Image
    mask: Mask
    score_map: Optional[ScoreMap]
    char_boxes: Sequence[CharBox]
    # NOTE: char_glyphs may not share shapes with char_boxes.
    char_glyphs: Sequence[CharGlyph]
    resize_interpolation: Interpolation
    style: FontEngineRunConfigStyle
    font_size: int
    text: str
    is_hori: bool

    # Set once bound to a page.
    shifted: bool = False

    # For debugging.
    font_variant: Optional[FontVariant] = None

    @property
    def box(self) -> Box:
        assert self.mask.box
        return self.mask.box

    @property
    def glyph_color(self) -> Tuple[int, int, int]:
        return self.style.glyph_color

    def to_shifted_text_line(self, offset_y: int = 0, offset_x: int = 0) -> 'TextLine':
        self.shifted = True
        shifted_image = self.image.to_shifted_image(offset_y=offset_y, offset_x=offset_x)
        shifted_mask = self.mask.to_shifted_mask(offset_y=offset_y, offset_x=offset_x)
        shifted_score_map = None
        if self.score_map:
            shifted_score_map = self.score_map.to_shifted_score_map(
                offset_y=offset_y, offset_x=offset_x
            )
        shifted_char_boxes = [
            char_box.to_shifted_char_box(offset_y=offset_y, offset_x=offset_x)
            for char_box in self.char_boxes
        ]
        return attr.evolve(
            self,
            image=shifted_image,
            mask=shifted_mask,
            score_map=shifted_score_map,
            char_boxes=shifted_char_boxes,
        )

    def split(self) -> List['TextLine']:
        texts = self.text.split()
        if len(texts) == 1:
            return [self]
        assert len(texts) > 1

        text_lines: List[TextLine] = []
        begin = 0
        for text in texts:
            end = begin + len(text) - 1
            char_boxes = self.char_boxes[begin:end + 1]
            char_glyphs = self.char_glyphs[begin:end + 1]

            if self.is_hori:
                left = char_boxes[0].left
                right = char_boxes[-1].right
                up = min(char_box.up for char_box in char_boxes)
                down = max(char_box.down for char_box in char_boxes)
            else:
                up = char_boxes[0].up
                down = char_boxes[-1].down
                left = min(char_box.left for char_box in char_boxes)
                right = max(char_box.right for char_box in char_boxes)
            box = Box(up=up, down=down, left=left, right=right)

            image = box.extract_image(self.image)
            mask = box.extract_mask(self.mask)
            score_map = None
            if self.score_map:
                score_map = box.extract_score_map(self.score_map)

            text_lines.append(
                attr.evolve(
                    self,
                    image=image,
                    mask=mask,
                    score_map=score_map,
                    char_boxes=char_boxes,
                    char_glyphs=char_glyphs,
                    text=text,
                )
            )
            begin = end + 1
        return text_lines

    def to_polygon(self) -> Polygon:
        # Staircase outline tracking char boxes; matches type.py:560-613.
        if self.is_hori:
            xs = [self.box.left]
            for char_box in self.char_boxes:
                if xs[-1] < char_box.left:
                    xs.append(char_box.left)
                if char_box.left < char_box.right:
                    xs.append(char_box.right)
            if xs[-1] < self.box.right:
                xs.append(self.box.right)

            points = PointList()
            for x in xs:
                points.append(Point.create(y=self.box.up, x=x))
            y_mid = (self.box.up + self.box.down) // 2
            if self.box.up < y_mid < self.box.down:
                points.append(Point.create(y=y_mid, x=xs[-1]))
            for x in reversed(xs):
                points.append(Point.create(y=self.box.down, x=x))
            if self.box.up < y_mid < self.box.down:
                points.append(Point.create(y=y_mid, x=xs[0]))
            return Polygon.create(points=points)

        ys = [self.box.up]
        for char_box in self.char_boxes:
            if ys[-1] < char_box.up:
                ys.append(char_box.up)
            if char_box.up < char_box.down:
                ys.append(char_box.down)
        if ys[-1] < self.box.down:
            ys.append(self.box.down)

        points = PointList()
        for y in ys:
            points.append(Point.create(y=y, x=self.box.right))
        x_mid = (self.box.left + self.box.right) // 2
        if self.box.left < x_mid < self.box.right:
            points.append(Point.create(y=ys[-1], x=x_mid))
        for y in reversed(ys):
            points.append(Point.create(y=y, x=self.box.left))
        if self.box.left < x_mid < self.box.right:
            points.append(Point.create(y=ys[0], x=x_mid))
        return Polygon.create(points=points)

    @classmethod
    def build_char_polygon(cls, up: float, down: float, left: float, right: float):
        return Polygon.from_xy_pairs([
            (left, up), (right, up), (right, down), (left, down)
        ])

    def to_char_polygons(
        self,
        page_height: int,
        page_width: int,
        ref_char_height_ratio: float = 1.0,
        ref_char_width_ratio: float = 1.0,
    ) -> List[Polygon]:
        assert len(self.char_boxes) == len(self.char_glyphs)

        polygons: List[Polygon] = []
        for char_box, char_glyph in zip(self.char_boxes, self.char_glyphs):
            ref_char_height = char_glyph.ref_char_height * ref_char_height_ratio
            ref_char_width = char_glyph.ref_char_width * ref_char_width_ratio
            box = char_box.box

            if self.is_hori:
                up, down = box.up, box.down
                if box.height < ref_char_height:
                    half_inc = (ref_char_height - box.height) / 2
                    up = max(0, up - half_inc)
                    down = min(page_height - 1, down + half_inc)
                left, right = box.left, box.right
                if box.width < ref_char_width:
                    half_inc = (ref_char_width - box.width) / 2
                    left = max(0, left - half_inc)
                    right = min(page_width - 1, right + half_inc)
            else:
                left, right = box.left, box.right
                if box.width < ref_char_height:
                    half_inc = (ref_char_height - box.width) / 2
                    left = max(0, left - half_inc)
                    right = min(page_width - 1, right + half_inc)
                up, down = box.up, box.down
                if box.height < ref_char_width:
                    half_inc = (ref_char_width - box.height) / 2
                    up = max(self.box.up, up - half_inc)
                    down = min(page_height - 1, down + half_inc)

            polygons.append(
                self.build_char_polygon(up=up, down=down, left=left, right=right)
            )
        return polygons

    def get_height_points(self, num_points: int, is_up: bool) -> PointList:
        if self.is_hori:
            step = max(1, self.box.width // num_points)
            xs = list(range(0, self.box.right + 1, step))
            if len(xs) >= num_points:
                xs = xs[:num_points - 1]
                xs.append(self.box.right)
            points = PointList()
            y = self.box.up if is_up else self.box.down
            for x in xs:
                points.append(Point.create(y=y, x=x))
            return points

        step = max(1, self.box.height // num_points)
        ys = list(range(self.box.up, self.box.down + 1, step))
        if len(ys) >= num_points:
            ys = ys[:num_points - 1]
            ys.append(self.box.down)
        points = PointList()
        x = self.box.right if is_up else self.box.left
        for y in ys:
            points.append(Point.create(y=y, x=x))
        return points

    def get_char_level_height_points(self, is_up: bool) -> PointList:
        points = PointList()
        if self.is_hori:
            y = self.box.up if is_up else self.box.down
            for char_box in self.char_boxes:
                x = (char_box.left + char_box.right) / 2
                points.append(Point.create(y=y, x=x))
        else:
            x = self.box.right if is_up else self.box.left
            for char_box in self.char_boxes:
                y = (char_box.up + char_box.down) / 2
                points.append(Point.create(y=y, x=x))
        return points
