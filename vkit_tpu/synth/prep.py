"""Host-side page prep for the batched device synthesis pipeline.

Per page (all cheap, numpy/host): sample a layout (the same PageLayoutStep
the 17-step pipeline uses), sample chars + font per layout line, lay the
line out with the glyph atlas (NO host painting), and rasterize the
pre-distortion label channels from the label polygons.  The output is a
HostPage of flat tensors + glyph placement entries that synth.device
consumes.

Behavioral spec: vkit/pipeline/text_detection/{page_layout,page_text_line,
page_text_line_label,page_distortion}.py — the label channels here are the
pre-warp form of what page_distortion regenerates post-warp; synth.device
warps them alongside the image and corrects heights by the local stretch.
"""
from typing import Any, List, Mapping, Optional, Sequence, Tuple, Union

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ..element import Box, LexiconCollection, Polygon, ScoreMap
from ..engine.char_and_font_sampler import (
    char_and_font_sampler_engine_executor_factory,
)
from ..engine.char_sampler import (
    char_sampler_engine_executor_aggregator_factory,
)
from ..engine.font import (
    FontCollection,
    FontEngineRunConfig,
    FontEngineRunConfigStyle,
    TextLine,
)
from ..engine.font.atlas import (
    get_glyph_atlas,
    layout_to_text_line,
    plan_text_line_layout,
)
from ..pipeline.text_detection.page_layout import (
    PageLayoutStep,
    PageLayoutStepConfig,
    PageLayoutStepInput,
)
from ..pipeline.text_detection.page_shape import PageShapeStepOutput
from ..utility import PathType, normalize_to_keys_and_probs, rng_choice

# Same gates as PageTextLineStep (page_text_line.py _GLYPH_COLOR_GATES).
_GLYPH_COLOR_GATES = {
    'grayscale': None,
    'red': (1, 0, 0),
    'green': (0, 1, 0),
    'blue': (0, 0, 1),
}

# Label channel indices in HostPage.label_stack / SynthBatchResult.
TEXT_LINE_MASK = 0
TEXT_LINE_HEIGHT = 1
CHAR_MASK = 2
CHAR_HEIGHT = 3
NUM_LABEL_CHANNELS = 4


@attr.define
class SynthPlannerConfig:
    lexicon_collection_json: str
    font_collection_folder: str
    char_sampler_configs: Union[Sequence[Mapping[str, Any]], PathType]
    page_height: int = 640
    page_width: int = 640
    font_style: FontEngineRunConfigStyle = attr.field(
        factory=FontEngineRunConfigStyle
    )
    layout_config: Optional[Mapping[str, Any]] = None
    background_grayscale_min: int = 127
    background_grayscale_max: int = 255
    # Glyph color sampling (page_text_line.py defaults).
    weight_glyph_color_grayscale: float = 0.9
    glyph_color_grayscale_min: int = 0
    glyph_color_grayscale_max: int = 100
    weight_glyph_color_red: float = 0.06
    weight_glyph_color_green: float = 0.01
    weight_glyph_color_blue: float = 0.03
    glyph_color_rgb_min: int = 100
    glyph_color_rgb_max: int = 255
    # Char polygon expansion (page_text_line_label.py semantics).
    ref_char_height_ratio: float = 1.0
    ref_char_width_ratio: float = 1.0


@attr.define
class HostPage:
    """One prepared page: the flat-tensor input of the device program."""
    background: np.ndarray            # (H, W, 3) uint8
    label_stack: np.ndarray           # (H, W, 4) float32
    # (layout, (up, left), color, atlas) per PLACED text line.
    line_entries: List[Tuple]
    text_lines: List[TextLine]        # word-split, blank-raster lines
    word_polygons: List[Polygon]
    char_polygons: List[Polygon]


class SynthPlanner:

    def __init__(self, config: SynthPlannerConfig):
        self.config = config
        lexicon_collection = LexiconCollection.from_file(
            config.lexicon_collection_json
        )
        font_collection = FontCollection.from_folder(
            config.font_collection_folder
        )
        aggregator = (
            char_sampler_engine_executor_aggregator_factory
            .create_with_repeated_init_resource(
                config.char_sampler_configs,
                {'lexicon_collection': lexicon_collection},
            )
        )
        self.char_and_font_sampler = (
            char_and_font_sampler_engine_executor_factory.create(
                {},
                {
                    'lexicon_collection': lexicon_collection,
                    'font_collection': font_collection,
                    'char_sampler_engine_executor_aggregator': aggregator,
                },
            )
        )
        self.layout_step = PageLayoutStep(
            PageLayoutStepConfig(**(config.layout_config or {}))
        )
        self.color_keys, self.color_probs = normalize_to_keys_and_probs([
            ('grayscale', config.weight_glyph_color_grayscale),
            ('red', config.weight_glyph_color_red),
            ('green', config.weight_glyph_color_green),
            ('blue', config.weight_glyph_color_blue),
        ])

    # -- sampling helpers (page_text_line.py semantics) -------------------

    def _sample_glyph_color(self, rng: RandomGenerator) -> Tuple[int, int, int]:
        cfg = self.config
        gate = _GLYPH_COLOR_GATES[
            rng_choice(rng, self.color_keys, probs=self.color_probs)
        ]
        if gate is None:
            tone = int(rng.integers(cfg.glyph_color_grayscale_min,
                                    cfg.glyph_color_grayscale_max + 1))
            return (tone, tone, tone)
        value = int(rng.integers(cfg.glyph_color_rgb_min,
                                 cfg.glyph_color_rgb_max + 1))
        return tuple(value * g for g in gate)  # type: ignore[return-value]

    def _sample_char_and_font(self, box: Box, rng: RandomGenerator):
        for _ in range(3):
            out = self.char_and_font_sampler.run(
                run_config={'height': box.height, 'width': box.width}, rng=rng
            )
            if out:
                return out
        return None

    # -- page prep ---------------------------------------------------------

    def prepare_page(self, rng: RandomGenerator) -> HostPage:
        cfg = self.config
        height, width = cfg.page_height, cfg.page_width

        layout_out = self.layout_step.run(
            PageLayoutStepInput(
                page_shape_step_output=PageShapeStepOutput(
                    height=height, width=width
                )
            ),
            rng,
        )
        layout = layout_out.page_layout

        tone = int(rng.integers(cfg.background_grayscale_min,
                                cfg.background_grayscale_max + 1))
        background = np.full((height, width, 3), tone, dtype=np.uint8)

        line_entries: List[Tuple] = []
        text_lines: List[TextLine] = []
        for layout_text_line in layout.layout_text_lines:
            box = layout_text_line.box
            char_and_font = self._sample_char_and_font(box, rng)
            if char_and_font is None:
                continue
            color = self._sample_glyph_color(rng)
            style = attr.evolve(cfg.font_style, glyph_color=color)
            run_config = FontEngineRunConfig(
                height=box.height,
                width=box.width,
                chars=char_and_font.chars,
                font_variant=char_and_font.font_variant,
                glyph_sequence=layout_text_line.glyph_sequence,
                style=style,
            )
            try:
                text_layout = plan_text_line_layout(run_config, rng)
            except RuntimeError:
                continue
            if text_layout is None:
                continue
            atlas = get_glyph_atlas(run_config)
            line_entries.append(
                (text_layout, (box.up, box.left), color, atlas)
            )
            placed = layout_to_text_line(
                text_layout, atlas, style, run_config.chars
            ).to_shifted_text_line(offset_y=box.up, offset_x=box.left)
            text_lines.extend(placed.split())

        # Pre-distortion label channels.
        shape = (height, width)
        tl_mask = ScoreMap.from_shape(shape)
        tl_height = ScoreMap.from_shape(shape, is_prob=False)
        ch_mask_mat = np.zeros(shape, dtype=np.float32)
        ch_height_mat = np.zeros(shape, dtype=np.float32)

        word_polygons: List[Polygon] = []
        char_polygons: List[Polygon] = []
        for word in text_lines:
            if word.box.height < 2 or word.box.width < 2:
                continue  # degenerate sliver (e.g. a lone 1-px-wide glyph)
            polygon = word.to_polygon()
            word_polygons.append(polygon)
            polygon.fill_score_map(tl_mask, 1.0)
            polygon.fill_score_map(tl_height, float(word.box.height))
            chars = word.to_char_polygons(
                page_height=height, page_width=width,
                ref_char_height_ratio=cfg.ref_char_height_ratio,
                ref_char_width_ratio=cfg.ref_char_width_ratio,
            )
            char_polygons.extend(chars)
            # Char polygons are axis-aligned rectangles (ref-metric box
            # expansion, TextLine.build_char_polygon): direct slice fills
            # are ~50x the generic polygon rasterizer here (tens of
            # thousands of tiny fills per page batch).
            for char_polygon, char_box in zip(chars, word.char_boxes):
                xy = char_polygon.np_xy
                left = max(int(round(xy[:, 0].min())), 0)
                right = min(int(round(xy[:, 0].max())), width - 1)
                up = max(int(round(xy[:, 1].min())), 0)
                down = min(int(round(xy[:, 1].max())), height - 1)
                if right < left or down < up:
                    continue
                window = (slice(up, down + 1), slice(left, right + 1))
                ch_mask_mat[window] = 1.0
                np.maximum(
                    ch_height_mat[window], float(char_box.height),
                    out=ch_height_mat[window],
                )

        label_stack = np.stack(
            [tl_mask.mat, tl_height.mat, ch_mask_mat, ch_height_mat], axis=-1
        )
        return HostPage(
            background=background,
            label_stack=label_stack,
            line_entries=line_entries,
            text_lines=text_lines,
            word_polygons=word_polygons,
            char_polygons=char_polygons,
        )

    def prepare_batch(self, batch_size: int,
                      rng: RandomGenerator) -> List[HostPage]:
        return [self.prepare_page(rng) for _ in range(batch_size)]
