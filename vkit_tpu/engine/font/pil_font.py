"""Text-line rendering via PIL's FreeType binding.

Capability parity: vkit/engine/font/freetype.py:41-1175 — the full path:
per-char glyph build (tight trim, baseline metrics, gamma→alpha score map,
per-tag reference metrics), kerning-limit detection by sliding mask overlap,
random char/word spacing, horizontal + vertical layout, resize/pad/trim with
residual-pixel cleanup, and three renderers:

* ``freetype_default``  — grayscale antialiased,
* ``freetype_lcd``      — subpixel RGB coverage (3x horizontal oversampling),
* ``freetype_monochrome`` — 1-bit.

The reference drives freetype-py directly; here glyphs rasterize through
PIL/FreeType (same library underneath) with metrics from ``getbbox`` /
``getlength`` / ``getmetrics``.
"""
import functools
from typing import Callable, List, Optional, Sequence, Tuple

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator
from PIL import Image as PilImage
from PIL import ImageDraw, ImageFont

from ...element import Box, Image, Interpolation, Mask, ScoreMap
from ...utility import sample_resize_interpolation
from ..interface import (
    Engine,
    EngineExecutorFactory,
    NoneTypeEngineInitConfig,
    NoneTypeEngineInitResource,
)
from .type import (
    CharBox,
    CharGlyph,
    FontEngineRunConfig,
    FontEngineRunConfigGlyphSequence,
    TextLine,
)


def estimate_font_size(config: FontEngineRunConfig) -> int:
    style = config.style
    if config.glyph_sequence == FontEngineRunConfigGlyphSequence.HORI_DEFAULT:
        font_size = round(config.height * style.font_size_ratio)
    elif config.glyph_sequence == FontEngineRunConfigGlyphSequence.VERT_DEFAULT:
        font_size = round(config.width * style.font_size_ratio)
    else:
        raise NotImplementedError()
    return int(np.clip(font_size, style.font_size_min, style.font_size_max))


@functools.lru_cache(maxsize=256)
def _load_pil_font(font_file: str, font_size: int, ttc_index: int) -> ImageFont.FreeTypeFont:
    return ImageFont.truetype(font_file, size=font_size, index=ttc_index)


def load_pil_font(run_config: FontEngineRunConfig, scale: int = 1) -> ImageFont.FreeTypeFont:
    font_variant = run_config.font_variant
    ttc_index = font_variant.ttc_font_index if font_variant.is_ttc else 0
    return _load_pil_font(
        str(font_variant.font_file),
        estimate_font_size(run_config) * scale,
        ttc_index or 0,
    )


def _rasterize_char(
    font: ImageFont.FreeTypeFont,
    char: str,
    mode: str,
) -> Tuple[np.ndarray, int, int, float]:
    """Render one char; returns (np_image, ink_top_rel_baseline, left_bearing,
    advance).

    ``np_image`` is the tight ink bitmap; ink_top_rel_baseline is the distance
    from the baseline down to the top ink row (negative above baseline
    convention handled by caller).
    """
    ascent_font, descent = font.getmetrics()
    # Canvas large enough for any glyph incl. negative bearings.
    advance = font.getlength(char)
    pad = max(8, int(font.size))
    canvas_w = int(advance) + 2 * pad
    canvas_h = ascent_font + descent + 2 * pad
    canvas = PilImage.new('L', (canvas_w, canvas_h), 0)
    draw = ImageDraw.Draw(canvas)
    draw.text((pad, pad), char, fill=255, font=font)
    np_canvas = np.array(canvas, dtype=np.uint8)

    if mode == 'mono':
        np_canvas = np.where(np_canvas >= 128, 255, 0).astype(np.uint8)

    ys, xs = np.nonzero(np_canvas)
    if len(ys) == 0:
        raise RuntimeError(f'empty glyph for char={char!r}')
    top, bottom = int(ys.min()), int(ys.max())
    left, right = int(xs.min()), int(xs.max())
    np_image = np_canvas[top:bottom + 1, left:right + 1]

    baseline_y = pad + ascent_font
    # ascent: distance from baseline up to top-most ink scanline.
    ascent = baseline_y - top
    left_bearing = left - pad
    return np_image, ascent, left_bearing, advance


def build_char_glyph(
    config: FontEngineRunConfig,
    char: str,
    np_image: np.ndarray,
    ascent: int,
    left_bearing: int,
    advance: float,
) -> CharGlyph:
    """Assemble a CharGlyph with baseline metrics + per-tag reference stats
    (freetype.py:136-221 semantics; bitmaps arrive pre-trimmed here so the
    vertical trim pads are zero by construction)."""
    assert not char.isspace()

    pad_left = max(0, left_bearing)
    pad_right = max(0, round(advance) - pad_left - np_image.shape[1])

    score_map = None
    if np_image.ndim == 2:
        np_alpha = np.power(
            np_image.astype(np.float32) / 255.0,
            config.style.glyph_color_gamma,
        )
        score_map = ScoreMap(mat=np_alpha)

    font_variant = config.font_variant
    tag_to_font_glyph_info = (
        font_variant.font_glyph_info_collection.tag_to_font_glyph_info
    )
    assert char in font_variant.char_to_tags

    font_glyph_info = None
    for tag in font_variant.char_to_tags[char]:
        cur = tag_to_font_glyph_info[tag]
        if font_glyph_info is None:
            font_glyph_info = cur
        else:
            assert font_glyph_info == cur
    assert font_glyph_info is not None

    font_size = estimate_font_size(config)
    return CharGlyph(
        char=char,
        image=Image(mat=np_image),
        score_map=score_map,
        ascent=ascent,
        pad_up=0,
        pad_down=0,
        pad_left=pad_left,
        pad_right=pad_right,
        ref_ascent_plus_pad_up=round(
            font_glyph_info.ascent_plus_pad_up_min_to_font_size_ratio * font_size
        ),
        ref_char_height=round(font_glyph_info.height_min_to_font_size_ratio * font_size),
        ref_char_width=round(font_glyph_info.width_min_to_font_size_ratio * font_size),
    )


def render_char_glyphs_from_text(
    run_config: FontEngineRunConfig,
    font: ImageFont.FreeTypeFont,
    func_render_char_glyph: Callable[..., CharGlyph],
    chars: Sequence[str],
):
    char_glyphs: List[CharGlyph] = []
    prev_num_spaces_for_char_glyphs: List[int] = []
    num_spaces = 0
    for idx, char in enumerate(chars):
        if char.isspace():
            num_spaces += 1
            continue
        char_glyphs.append(func_render_char_glyph(run_config, font, char))
        if idx == 0 and num_spaces > 0:
            raise RuntimeError('Leading space(s) detected.')
        prev_num_spaces_for_char_glyphs.append(num_spaces)
        num_spaces = 0
    if num_spaces > 0:
        raise RuntimeError('Trailing space(s) detected.')
    return char_glyphs, prev_num_spaces_for_char_glyphs


def get_kerning_limits_hori_default(
    char_glyphs: Sequence[CharGlyph],
    prev_num_spaces_for_char_glyphs: Sequence[int],
) -> List[int]:
    """How far each glyph may slide left before its ink overlaps the previous
    glyph's (freetype.py:251-311)."""
    assert char_glyphs
    ascent_max = max(char_glyph.ascent for char_glyph in char_glyphs)

    kerning_limits: List[int] = []
    prev_glyph_mask = None
    prev_np_glyph_mask = None
    prev_up = None
    prev_down = None

    for char_glyph, prev_num_spaces in zip(char_glyphs, prev_num_spaces_for_char_glyphs):
        glyph_mask = char_glyph.get_glyph_mask()
        np_glyph_mask = glyph_mask.mat
        up = ascent_max - char_glyph.ascent
        down = up + np_glyph_mask.shape[0] - 1

        if prev_num_spaces == 0 and prev_np_glyph_mask is not None:
            overlap_up = max(prev_up, up)
            overlap_down = min(prev_down, down)
            if overlap_up <= overlap_down:
                overlap_prev = prev_np_glyph_mask[
                    overlap_up - prev_up:overlap_down - prev_up + 1
                ]
                overlap_cur = np_glyph_mask[overlap_up - up:overlap_down - up + 1]

                kerning_limit = 1
                while kerning_limit < prev_glyph_mask.width / 2 \
                        and kerning_limit < glyph_mask.width / 2:
                    prev_tail = overlap_prev[:, -kerning_limit:]
                    cur_head = overlap_cur[:, :kerning_limit]
                    if (prev_tail & cur_head).any():
                        kerning_limit -= 1
                        break
                    kerning_limit += 1
                kerning_limits.append(kerning_limit)
            else:
                kerning_limits.append(0)
        else:
            kerning_limits.append(0)

        prev_glyph_mask = glyph_mask
        prev_np_glyph_mask = np_glyph_mask
        prev_up = up
        prev_down = down

    return kerning_limits


def render_char_glyphs_in_text_line(
    style,
    text_line_height: int,
    text_line_width: int,
    char_glyphs: Sequence[CharGlyph],
    char_boxes: Sequence[CharBox],
):
    np_image = np.full((text_line_height, text_line_width, 3), 255, dtype=np.uint8)
    np_mask = np.zeros((text_line_height, text_line_width), dtype=np.uint8)
    score_map = None

    if char_glyphs[0].image.mat.ndim == 2:
        # Grayscale / mono: alpha-composite the glyph color.
        score_map = ScoreMap.from_shape((text_line_height, text_line_width))
        for char_glyph, char_box in zip(char_glyphs, char_boxes):
            assert char_glyph.score_map
            char_glyph_mask = char_glyph.get_glyph_mask(box=char_box.box)

            alpha = char_glyph.score_map.mat[..., None]
            np_char_image = (
                (1 - alpha) * 255.0 + alpha * np.asarray(style.glyph_color)
            )
            np_char_image = np.clip(np.round(np_char_image), 0, 255).astype(np.uint8)

            char_glyph_mask.fill_np_array(np_image, np_char_image)
            char_glyph_mask.fill_np_array(np_mask, 1)
            char_box.box.fill_score_map(
                score_map, char_glyph.score_map, keep_max_value=True
            )
    elif char_glyphs[0].image.mat.ndim == 3:
        # LCD subpixel coverage (glyph_color ignored, as the reference).
        for char_glyph, char_box in zip(char_glyphs, char_boxes):
            char_glyph_mask = char_glyph.get_glyph_mask(box=char_box.box)
            np_char_image = np.power(
                char_glyph.image.mat / 255.0, style.glyph_color_gamma
            )
            np_char_image = ((1 - np_char_image) * 255).astype(np.uint8)
            char_glyph_mask.fill_np_array(np_image, np_char_image)
            char_glyph_mask.fill_np_array(np_mask, 1)
    else:
        raise NotImplementedError()

    return Image(mat=np_image), Mask(mat=np_mask), score_map, char_boxes


def _sample_space(style, char_widths_avg, prev_num_spaces, rng):
    if prev_num_spaces > 0:
        space = 0
        for _ in range(prev_num_spaces):
            space += round(
                np.clip(
                    rng.normal(
                        loc=char_widths_avg * style.word_space_mean,
                        scale=char_widths_avg * style.word_space_std,
                    ),
                    char_widths_avg * style.word_space_min,
                    char_widths_avg * style.word_space_max,
                )
            )
        return space
    if rng.random() < style.prob_set_char_space_min:
        return round(char_widths_avg * style.char_space_min)
    return round(
        np.clip(
            rng.normal(
                loc=char_widths_avg * style.char_space_mean,
                scale=char_widths_avg * style.char_space_std,
            ),
            char_widths_avg * style.char_space_min,
            char_widths_avg * style.char_space_max,
        )
    )


def place_char_glyphs_in_text_line_hori_default(
    run_config: FontEngineRunConfig,
    char_glyphs: Sequence[CharGlyph],
    prev_num_spaces_for_char_glyphs: Sequence[int],
    kerning_limits: Sequence[int],
    rng: RandomGenerator,
):
    style = run_config.style
    assert char_glyphs
    char_widths_avg = float(np.mean([cg.width for cg in char_glyphs]))

    import itertools
    ascent_plus_pad_up_max = max(
        itertools.chain.from_iterable(
            (cg.ascent + cg.pad_up, cg.ref_ascent_plus_pad_up) for cg in char_glyphs
        )
    )
    text_line_height = max(cg.ref_char_height for cg in char_glyphs)

    char_boxes: List[CharBox] = []
    hori_offset = 0
    for char_idx, (char_glyph, prev_num_spaces, kerning_limit) in enumerate(
        zip(char_glyphs, prev_num_spaces_for_char_glyphs, kerning_limits)
    ):
        hori_offset -= kerning_limit
        hori_offset += _sample_space(style, char_widths_avg, prev_num_spaces, rng)

        up = ascent_plus_pad_up_max - char_glyph.ascent
        down = up + char_glyph.height - 1
        left = hori_offset + char_glyph.pad_left
        if char_idx == 0:
            left = 0
        right = left + char_glyph.width - 1

        char_boxes.append(
            CharBox(
                char=char_glyph.char,
                box=Box(up=up, down=down, left=left, right=right),
            )
        )
        text_line_height = max(text_line_height, down + 1 + char_glyph.pad_down)
        hori_offset = right + 1
        if char_idx < len(char_glyphs) - 1:
            hori_offset += char_glyph.pad_right

    return render_char_glyphs_in_text_line(
        style=style,
        text_line_height=text_line_height,
        text_line_width=hori_offset,
        char_glyphs=char_glyphs,
        char_boxes=char_boxes,
    )


def place_char_glyphs_in_text_line_vert_default(
    run_config: FontEngineRunConfig,
    char_glyphs: Sequence[CharGlyph],
    prev_num_spaces_for_char_glyphs: Sequence[int],
    rng: RandomGenerator,
):
    import itertools
    style = run_config.style
    assert char_glyphs
    char_widths_avg = float(np.mean([cg.width for cg in char_glyphs]))

    text_line_width = max(
        itertools.chain.from_iterable(
            (cg.pad_left + cg.width + cg.pad_right, cg.ref_char_width)
            for cg in char_glyphs
        )
    )
    text_line_width_mid = text_line_width // 2

    char_boxes: List[CharBox] = []
    vert_offset = 0
    for char_idx, (char_glyph, prev_num_spaces) in enumerate(
        zip(char_glyphs, prev_num_spaces_for_char_glyphs)
    ):
        vert_offset += _sample_space(style, char_widths_avg, prev_num_spaces, rng)

        up = vert_offset + char_glyph.pad_up
        if char_idx == 0:
            up = 0
        down = up + char_glyph.height - 1
        left = text_line_width_mid - char_glyph.width // 2
        right = left + char_glyph.width - 1

        char_boxes.append(
            CharBox(
                char=char_glyph.char,
                box=Box(up=up, down=down, left=left, right=right),
            )
        )
        vert_offset = down + 1
        if char_idx < len(char_glyphs) - 1:
            vert_offset += char_glyph.pad_down

    return render_char_glyphs_in_text_line(
        style=style,
        text_line_height=vert_offset,
        text_line_width=text_line_width,
        char_glyphs=char_glyphs,
        char_boxes=char_boxes,
    )


def resize_and_trim_text_line_hori_default(
    run_config: FontEngineRunConfig,
    interpolation_enlarge: Interpolation,
    interpolation_shrink: Interpolation,
    image: Image,
    mask: Mask,
    score_map: Optional[ScoreMap],
    char_boxes: Sequence[CharBox],
    char_glyphs: Sequence[CharGlyph],
):
    is_too_small = image.height / run_config.height < 0.8
    is_too_large = image.height > run_config.height
    interpolation = interpolation_shrink if is_too_large else interpolation_enlarge

    if is_too_small or is_too_large:
        resized_image = image.to_resized_image(
            resized_height=run_config.height, interpolation=interpolation
        )
        resized_mask = mask.to_resized_mask(
            resized_height=run_config.height, interpolation=interpolation
        )
        char_boxes = [
            char_box.to_conducted_resized_char_box(
                shapable_or_shape=image, resized_height=run_config.height
            ) for char_box in char_boxes
        ]
        if score_map:
            score_map = score_map.to_resized_score_map(
                resized_height=run_config.height, interpolation=interpolation
            )
        image = resized_image
        mask = resized_mask

    # Pad vertically to the target height.
    if image.height != run_config.height:
        pad_vert = run_config.height - image.height
        assert pad_vert > 0
        pad_up = pad_vert // 2
        pad_down = pad_vert - pad_up

        np_image = np.full((run_config.height, image.width, 3), 255, dtype=np.uint8)
        np_image[pad_up:-pad_down] = image.mat
        image.assign_mat(np_image)

        np_mask = np.zeros((run_config.height, image.width), dtype=np.uint8)
        np_mask[pad_up:-pad_down] = mask.mat
        mask.assign_mat(np_mask)

        char_boxes = [
            attr.evolve(
                char_box,
                box=char_box.box._replace(
                    up=char_box.up + pad_up,
                    down=char_box.down + pad_up,
                ),
            ) for char_box in char_boxes
        ]
        if score_map:
            padded = ScoreMap.from_shape((run_config.height, image.width))
            with padded.writable_context:
                padded.mat[pad_up:-pad_down] = score_map.mat
            score_map = padded

    # Trim overflowing chars.
    if image.width > run_config.width:
        last_idx = len(char_boxes) - 1
        while last_idx >= 0 and char_boxes[last_idx].right >= run_config.width:
            last_idx -= 1
        if last_idx == len(char_boxes) - 1:
            # Overflow caused by trailing glyph padding: drop the last char.
            last_idx -= 1
        if last_idx < 0 or char_boxes[last_idx].right >= run_config.width:
            return None, None, None, None, None

        last_char_box = char_boxes[last_idx]
        last_char_box_right = last_char_box.right

        # Clean residual pixels of the first dropped char.
        first_trimmed_box = char_boxes[last_idx + 1]
        if first_trimmed_box.left <= last_char_box_right:
            first_trimmed_glyph = char_glyphs[last_idx + 1]
            trimmed_mask = first_trimmed_glyph.get_glyph_mask(
                box=first_trimmed_box.box,
                enable_resize=True,
                interpolation=interpolation,
            )
            trimmed_mask.fill_image(image, (255, 255, 255))
            trimmed_mask.fill_mask(mask, 0)

            if first_trimmed_glyph.score_map:
                assert score_map
                trimmed_sm = first_trimmed_glyph.score_map
                if trimmed_sm.shape != first_trimmed_box.shape:
                    trimmed_sm = trimmed_sm.to_resized_score_map(
                        resized_height=first_trimmed_box.height,
                        resized_width=first_trimmed_box.width,
                        interpolation=interpolation,
                    )
                last_sm = char_glyphs[last_idx].score_map
                assert last_sm
                if last_sm.shape != last_char_box.shape:
                    last_sm = last_sm.to_resized_score_map(
                        resized_height=last_char_box.height,
                        resized_width=last_char_box.width,
                        interpolation=interpolation,
                    )
                first_trimmed_box.box.fill_score_map(score_map, 0)
                last_char_box.box.fill_score_map(
                    score_map, last_sm, keep_max_value=True
                )

        char_boxes = char_boxes[:last_idx + 1]
        image.assign_mat(image.mat[:, :last_char_box_right + 1])
        mask.assign_mat(mask.mat[:, :last_char_box_right + 1])
        if score_map:
            score_map.assign_mat(score_map.mat[:, :last_char_box_right + 1])

    return image, mask, score_map, char_boxes, interpolation


def resize_and_trim_text_line_vert_default(
    run_config: FontEngineRunConfig,
    interpolation_enlarge: Interpolation,
    interpolation_shrink: Interpolation,
    image: Image,
    mask: Mask,
    score_map: Optional[ScoreMap],
    char_boxes: Sequence[CharBox],
):
    is_too_small = image.width / run_config.width < 0.8
    is_too_large = image.width > run_config.width
    interpolation = interpolation_shrink if is_too_large else interpolation_enlarge

    if is_too_small or is_too_large:
        resized_image = image.to_resized_image(
            resized_width=run_config.width, interpolation=interpolation
        )
        resized_mask = mask.to_resized_mask(
            resized_width=run_config.width, interpolation=interpolation
        )
        char_boxes = [
            char_box.to_conducted_resized_char_box(
                shapable_or_shape=image, resized_width=run_config.width
            ) for char_box in char_boxes
        ]
        if score_map:
            score_map = score_map.to_resized_score_map(
                resized_width=run_config.width, interpolation=interpolation
            )
        image = resized_image
        mask = resized_mask

    if image.width != run_config.width:
        pad_hori = run_config.width - image.width
        assert pad_hori > 0
        pad_left = pad_hori // 2
        pad_right = pad_hori - pad_left

        np_image = np.full((image.height, run_config.width, 3), 255, dtype=np.uint8)
        np_image[:, pad_left:-pad_right] = image.mat
        image.assign_mat(np_image)

        np_mask = np.zeros((image.height, run_config.width), dtype=np.uint8)
        np_mask[:, pad_left:-pad_right] = mask.mat
        mask.assign_mat(np_mask)

        char_boxes = [
            attr.evolve(
                char_box,
                box=char_box.box._replace(
                    left=char_box.left + pad_left,
                    right=char_box.right + pad_left,
                ),
            ) for char_box in char_boxes
        ]
        if score_map:
            padded = ScoreMap.from_shape((image.height, run_config.width))
            with padded.writable_context:
                padded.mat[:, pad_left:-pad_right] = score_map.mat
            score_map = padded

    if image.height > run_config.height:
        last_idx = len(char_boxes) - 1
        while last_idx >= 0 and char_boxes[last_idx].down >= run_config.height:
            last_idx -= 1
        if last_idx == len(char_boxes) - 1:
            last_idx -= 1
        if last_idx < 0 or char_boxes[last_idx].down >= run_config.height:
            return None, None, None, None, None

        last_char_box_down = char_boxes[last_idx].down
        char_boxes = char_boxes[:last_idx + 1]
        image.assign_mat(image.mat[:last_char_box_down + 1])
        mask.assign_mat(mask.mat[:last_char_box_down + 1])
        if score_map:
            score_map.assign_mat(score_map.mat[:last_char_box_down + 1])

    return image, mask, score_map, char_boxes, interpolation


def render_text_line_meta(
    run_config: FontEngineRunConfig,
    font: ImageFont.FreeTypeFont,
    func_render_char_glyph: Callable[..., CharGlyph],
    rng: RandomGenerator,
    interpolation_enlarge: Interpolation = Interpolation.CUBIC,
    interpolation_shrink: Interpolation = Interpolation.AREA,
) -> Optional[TextLine]:
    char_glyphs, prev_num_spaces_for_char_glyphs = render_char_glyphs_from_text(
        run_config=run_config,
        font=font,
        func_render_char_glyph=func_render_char_glyph,
        chars=run_config.chars,
    )
    if not char_glyphs:
        return None

    if run_config.glyph_sequence == FontEngineRunConfigGlyphSequence.HORI_DEFAULT:
        kerning_limits = get_kerning_limits_hori_default(
            char_glyphs, prev_num_spaces_for_char_glyphs
        )
        image, mask, score_map, char_boxes = place_char_glyphs_in_text_line_hori_default(
            run_config=run_config,
            char_glyphs=char_glyphs,
            prev_num_spaces_for_char_glyphs=prev_num_spaces_for_char_glyphs,
            kerning_limits=kerning_limits,
            rng=rng,
        )
        image, mask, score_map, char_boxes, interpolation = (
            resize_and_trim_text_line_hori_default(
                run_config=run_config,
                interpolation_enlarge=interpolation_enlarge,
                interpolation_shrink=interpolation_shrink,
                image=image,
                mask=mask,
                score_map=score_map,
                char_boxes=char_boxes,
                char_glyphs=char_glyphs,
            )
        )
        is_hori = True
    elif run_config.glyph_sequence == FontEngineRunConfigGlyphSequence.VERT_DEFAULT:
        image, mask, score_map, char_boxes = place_char_glyphs_in_text_line_vert_default(
            run_config=run_config,
            char_glyphs=char_glyphs,
            prev_num_spaces_for_char_glyphs=prev_num_spaces_for_char_glyphs,
            rng=rng,
        )
        image, mask, score_map, char_boxes, interpolation = (
            resize_and_trim_text_line_vert_default(
                run_config=run_config,
                interpolation_enlarge=interpolation_enlarge,
                interpolation_shrink=interpolation_shrink,
                image=image,
                mask=mask,
                score_map=score_map,
                char_boxes=char_boxes,
            )
        )
        is_hori = False
    else:
        raise NotImplementedError()

    if image is None:
        return None
    assert mask is not None and char_boxes is not None

    char_idx = 0
    non_space_count = 0
    while char_idx < len(run_config.chars) and non_space_count < len(char_boxes):
        if not run_config.chars[char_idx].isspace():
            non_space_count += 1
        char_idx += 1
    assert non_space_count == len(char_boxes)

    box = Box.from_shapable(image)
    image = image.to_box_attached(box)
    mask = mask.to_box_attached(box)
    if score_map:
        score_map = score_map.to_box_attached(box)

    return TextLine(
        image=image,
        mask=mask,
        score_map=score_map,
        char_boxes=char_boxes,
        char_glyphs=char_glyphs[:len(char_boxes)],
        resize_interpolation=interpolation or Interpolation.CUBIC,
        font_size=estimate_font_size(run_config),
        style=run_config.style,
        text=''.join(run_config.chars[:char_idx]),
        is_hori=is_hori,
        font_variant=run_config.font_variant if run_config.return_font_variant else None,
    )


class FontFreetypeDefaultEngine(
    Engine[
        NoneTypeEngineInitConfig,
        NoneTypeEngineInitResource,
        FontEngineRunConfig,
        Optional[TextLine],
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'freetype_default'

    @classmethod
    def render_char_glyph(cls, run_config, font, char: str) -> CharGlyph:
        np_image, ascent, left_bearing, advance = _rasterize_char(font, char, 'aa')
        return build_char_glyph(run_config, char, np_image, ascent, left_bearing, advance)

    def run(self, run_config: FontEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> Optional[TextLine]:
        assert rng is not None
        font = load_pil_font(run_config)
        return render_text_line_meta(
            run_config=run_config,
            font=font,
            func_render_char_glyph=self.render_char_glyph,
            rng=rng,
            interpolation_enlarge=sample_resize_interpolation(rng),
            interpolation_shrink=sample_resize_interpolation(rng, include_area=True),
        )


font_freetype_default_engine_executor_factory = EngineExecutorFactory(
    FontFreetypeDefaultEngine
)


class FontFreetypeLcdEngine(
    Engine[
        NoneTypeEngineInitConfig,
        NoneTypeEngineInitResource,
        FontEngineRunConfig,
        Optional[TextLine],
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'freetype_lcd'

    @classmethod
    def render_char_glyph(cls, run_config, font, char: str) -> CharGlyph:
        # Subpixel coverage from 3x oversampling: the big grayscale glyph's
        # column triplets become the R/G/B coverage channels.
        np_big, ascent3, left_bearing3, advance3 = _rasterize_char(font, char, 'aa')
        height3, width3 = np_big.shape
        height = max(1, round(height3 / 3))
        width3_pad = (-width3) % 3
        if width3_pad:
            np_big = np.pad(np_big, ((0, 0), (0, width3_pad)))
        width = np_big.shape[1] // 3

        from ...ops.resize_taps import resize_np
        np_rows = resize_np(np_big, (height, np_big.shape[1]), Interpolation.AREA)
        np_image = np_rows.reshape(height, width, 3)

        return build_char_glyph(
            run_config,
            char,
            np_image,
            round(ascent3 / 3),
            round(left_bearing3 / 3),
            advance3 / 3,
        )

    def run(self, run_config: FontEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> Optional[TextLine]:
        assert rng is not None
        font = load_pil_font(run_config, scale=3)
        return render_text_line_meta(
            run_config=run_config,
            font=font,
            func_render_char_glyph=self.render_char_glyph,
            rng=rng,
            interpolation_enlarge=sample_resize_interpolation(rng),
            interpolation_shrink=sample_resize_interpolation(rng, include_area=True),
        )


font_freetype_lcd_engine_executor_factory = EngineExecutorFactory(FontFreetypeLcdEngine)


class FontFreetypeMonochromeEngine(
    Engine[
        NoneTypeEngineInitConfig,
        NoneTypeEngineInitResource,
        FontEngineRunConfig,
        Optional[TextLine],
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'freetype_monochrome'

    @classmethod
    def render_char_glyph(cls, run_config, font, char: str) -> CharGlyph:
        np_image, ascent, left_bearing, advance = _rasterize_char(font, char, 'mono')
        return build_char_glyph(run_config, char, np_image, ascent, left_bearing, advance)

    def run(self, run_config: FontEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> Optional[TextLine]:
        assert rng is not None
        font = load_pil_font(run_config)
        return render_text_line_meta(
            run_config=run_config,
            font=font,
            func_render_char_glyph=self.render_char_glyph,
            rng=rng,
            interpolation_enlarge=sample_resize_interpolation(rng),
            interpolation_shrink=sample_resize_interpolation(rng, include_area=True),
        )


font_freetype_monochrome_engine_executor_factory = EngineExecutorFactory(
    FontFreetypeMonochromeEngine
)
