"""Fill rendered text lines into seal impression char slots.

Capability parity: vkit/engine/seal_impression/text_line_slot_filler.py:28-205
— per char: aspect-ratio-resized alpha score map, rotation to the slot angle,
anchored placement by the slot's point_up, plus the internal text line.
"""
import logging
from typing import List, Optional, Sequence, Tuple

import attr
import numpy as np

from ...element import Box, Point, Polygon, ScoreMap
from ...mechanism.distortion import rotate
from ..font import TextLine
from .type import SealImpression

logger = logging.getLogger(__name__)


def fill_text_line_to_seal_impression(
    seal_impression: SealImpression,
    text_line_slot_indices: Sequence[int],
    text_lines: Sequence[TextLine],
    internal_text_line: Optional[TextLine],
) -> Tuple[ScoreMap, List[Polygon]]:
    score_map = ScoreMap.from_shape(seal_impression.shape)
    char_polygons: List[Polygon] = []

    assert len(text_line_slot_indices) == len(text_lines)

    for text_line_slot_idx, text_line in zip(text_line_slot_indices, text_lines):
        if text_line_slot_idx >= len(seal_impression.text_line_slots):
            logger.error('fill_text_line_to_seal_impression: slot index out of range.')
            break

        assert text_line.is_hori
        assert not text_line.shifted

        text_line_slot = seal_impression.text_line_slots[text_line_slot_idx]

        # Reference char metrics for aspect-ratio adjustment.
        text_line_ref_char_height = 0
        text_line_ref_char_width = 0
        for char_glyph in text_line.char_glyphs:
            if char_glyph.ref_char_height > text_line_ref_char_height:
                text_line_ref_char_height = char_glyph.ref_char_height
                text_line_ref_char_width = char_glyph.ref_char_width
        assert text_line_ref_char_height > 0 and text_line_ref_char_width > 0
        text_line_aspect_ratio = text_line_ref_char_width / text_line_ref_char_height
        resized_char_width_factor = text_line_slot.char_aspect_ratio / text_line_aspect_ratio

        for char_slot_idx, (char_box, char_glyph) in enumerate(
            zip(text_line.char_boxes, text_line.char_glyphs)
        ):
            if char_slot_idx >= len(text_line_slot.char_slots):
                logger.error('fill_text_line_to_seal_impression: too many chars.')
                break

            char_slot = text_line_slot.char_slots[char_slot_idx]

            # Resize only the width; height stays at the text line height.
            resized_width = max(1, round(resized_char_width_factor * char_glyph.width))
            resized_box = char_box.box._replace(left=0, right=resized_width - 1)
            char_score_map = ScoreMap.from_shape((text_line.box.height, resized_width))

            if char_glyph.score_map:
                char_glyph_score_map = char_glyph.score_map
                if char_glyph_score_map.shape != resized_box.shape:
                    char_glyph_score_map = char_glyph_score_map.to_resized_score_map(
                        resized_height=resized_box.height,
                        resized_width=resized_box.width,
                        interpolation=text_line.resize_interpolation,
                    )
                resized_box.fill_score_map(char_score_map, char_glyph_score_map)
            else:
                # LCD glyph: fall back to its mask coverage.
                char_glyph_mask = char_glyph.get_glyph_mask(
                    box=char_box.box,
                    interpolation=text_line.resize_interpolation,
                )
                if char_glyph_mask.shape != resized_box.shape:
                    char_glyph_mask = char_glyph_mask.to_resized_mask(
                        resized_height=resized_box.height,
                        resized_width=resized_box.width,
                        interpolation=text_line.resize_interpolation,
                    )
                resized_box.fill_score_map(
                    char_score_map, char_glyph_mask.mat.astype(np.float32)
                )

            point_up = Point.create(y=0, x=char_score_map.width / 2)

            # Char polygon, ref-metric expanded.
            up = resized_box.up
            down = resized_box.down
            if resized_box.height < char_glyph.ref_char_height:
                half_inc = (char_glyph.ref_char_height - resized_box.height) / 2
                up -= half_inc
                down += half_inc
            left = resized_box.left
            right = resized_box.right
            ref_char_width = resized_char_width_factor * char_glyph.ref_char_width
            if resized_box.width < ref_char_width:
                half_inc = (ref_char_width - resized_box.width) / 2
                left -= half_inc
                right += half_inc
            char_polygon = Polygon.from_xy_pairs([
                (left, up), (right, up), (right, down), (left, down)
            ])

            # Rotate into the slot (horizontal text line is angle 270).
            rotated_result = rotate.distort(
                {'angle': char_slot.angle - 270},
                score_map=char_score_map,
                point=point_up,
                polygon=char_polygon,
                disable_clip_result_elements=True,
            )
            rotated_char_score_map = rotated_result.score_map
            rotated_point_up = rotated_result.point
            rotated_char_polygon = rotated_result.polygon
            assert rotated_char_score_map and rotated_point_up and rotated_char_polygon

            dst_up = char_slot.point_up.y - rotated_point_up.y
            dst_down = dst_up + rotated_char_score_map.height - 1
            dst_left = char_slot.point_up.x - rotated_point_up.x
            dst_right = dst_left + rotated_char_score_map.width - 1

            if dst_up < 0 or dst_down >= score_map.height \
                    or dst_left < 0 or dst_right >= score_map.width:
                logger.error('fill_text_line_to_seal_impression: out-of-bound.')
                continue

            dst_box = Box(up=dst_up, down=dst_down, left=dst_left, right=dst_right)
            dst_box.fill_score_map(score_map, rotated_char_score_map, keep_max_value=True)

            char_polygons.append(
                rotated_char_polygon.to_shifted_polygon(
                    offset_y=dst_up, offset_x=dst_left
                )
            )

    if internal_text_line:
        internal_text_line_box = seal_impression.internal_text_line_box
        assert internal_text_line_box

        internal_text_line = internal_text_line.to_shifted_text_line(
            offset_y=internal_text_line_box.up,
            offset_x=internal_text_line_box.left,
        )
        if internal_text_line.score_map:
            internal_text_line.box.fill_score_map(
                score_map, internal_text_line.score_map
            )
        else:
            internal_text_line.box.fill_score_map(
                score_map, internal_text_line.mask.mat.astype(np.float32)
            )
        char_polygons.extend(
            internal_text_line.to_char_polygons(
                page_height=score_map.height,
                page_width=score_map.width,
            )
        )

    score_map_max = score_map.mat.max()
    if score_map_max > 0:
        score_map.assign_mat(score_map.mat * seal_impression.alpha / score_map_max)

    return score_map, char_polygons
