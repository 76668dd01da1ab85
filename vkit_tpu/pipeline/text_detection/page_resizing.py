"""Page resizing step: land the smallest text line height in a target range.

Capability parity: vkit/pipeline/text_detection/page_resizing.py:29-193
(MAD-based outlier filtering of text line heights).
"""
import logging
from typing import Sequence

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ...element import Image, Mask, ScoreMap
from ...utility import sample_resize_interpolation
from ..interface import PipelineStep, PipelineStepFactory
from .page_distortion import PageDistortionStepOutput

logger = logging.getLogger(__name__)


@attr.define
class PageResizingStepConfig:
    resized_text_line_height_min: float = 3.0
    resized_text_line_height_max: float = 10.0
    text_line_heights_filtering_thr: float = 1.0


@attr.define
class PageResizingStepInput:
    page_distortion_step_output: PageDistortionStepOutput


@attr.define
class PageResizingStepOutput:
    page_image: Image
    page_active_mask: Mask
    page_char_mask: Mask
    page_seal_impression_char_mask: Mask
    page_char_height_score_map: ScoreMap
    page_text_line_mask: Mask
    page_text_line_height_score_map: ScoreMap


class PageResizingStep(
    PipelineStep[PageResizingStepConfig, PageResizingStepInput, PageResizingStepOutput]
):

    def get_text_line_heights_min(
        self,
        page_distorted_text_line_heights: Sequence[float],
    ) -> float:
        text_line_heights = [
            height for height in page_distorted_text_line_heights
            if height > self.config.text_line_heights_filtering_thr
        ]
        assert text_line_heights
        # Modified-z-score (MAD) outlier rejection.
        np_heights = np.asarray(text_line_heights)
        deltas = np.abs(np_heights - np.median(np_heights))
        deltas_median = np.median(deltas)
        delta_ratios = deltas / (deltas_median or 1.0)
        return float(
            min(
                height for height, delta_ratio in zip(text_line_heights, delta_ratios)
                if delta_ratio < 3.5
            )
        )

    def run(self, input: PageResizingStepInput, rng: RandomGenerator):
        out = input.page_distortion_step_output
        page_image = out.page_image
        page_active_mask = out.page_active_mask
        page_char_mask = out.page_char_mask
        page_seal_impression_char_mask = out.page_seal_impression_char_mask
        page_char_height_score_map = out.page_char_height_score_map
        page_text_line_mask = out.page_text_line_mask
        page_text_line_height_score_map = out.page_text_line_height_score_map
        page_distorted_text_line_heights = out.page_text_line_heights
        assert page_char_mask and page_seal_impression_char_mask
        assert page_char_height_score_map and page_text_line_mask
        assert page_text_line_height_score_map and page_distorted_text_line_heights

        height, width = page_image.shape
        text_line_heights_min = self.get_text_line_heights_min(
            page_distorted_text_line_heights
        )
        logger.debug(f'text_line_heights_min={text_line_heights_min}')
        resized_text_line_height = rng.uniform(
            self.config.resized_text_line_height_min,
            self.config.resized_text_line_height_max,
        )
        resize_ratio = resized_text_line_height / text_line_heights_min

        resized_height = round(resize_ratio * height)
        resized_width = round(resize_ratio * width)

        interpolation = sample_resize_interpolation(
            rng, include_area=(resize_ratio < 1.0)
        )

        page_image = page_image.to_resized_image(
            resized_height=resized_height,
            resized_width=resized_width,
            interpolation=interpolation,
        )
        page_active_mask = page_active_mask.to_resized_mask(
            resized_height=resized_height,
            resized_width=resized_width,
            interpolation=interpolation,
        )
        page_char_mask = page_char_mask.to_resized_mask(
            resized_height=resized_height,
            resized_width=resized_width,
            interpolation=interpolation,
        )
        page_seal_impression_char_mask = page_seal_impression_char_mask.to_resized_mask(
            resized_height=resized_height,
            resized_width=resized_width,
            interpolation=interpolation,
        )
        page_char_height_score_map = page_char_height_score_map.to_resized_score_map(
            resized_height=resized_height,
            resized_width=resized_width,
            interpolation=interpolation,
        )
        page_char_height_score_map.assign_mat(
            page_char_height_score_map.mat * resize_ratio
        )
        page_text_line_mask = page_text_line_mask.to_resized_mask(
            resized_height=resized_height,
            resized_width=resized_width,
            interpolation=interpolation,
        )
        page_text_line_height_score_map = (
            page_text_line_height_score_map.to_resized_score_map(
                resized_height=resized_height,
                resized_width=resized_width,
                interpolation=interpolation,
            )
        )
        page_text_line_height_score_map.assign_mat(
            page_text_line_height_score_map.mat * resize_ratio
        )

        return PageResizingStepOutput(
            page_image=page_image,
            page_active_mask=page_active_mask,
            page_char_mask=page_char_mask,
            page_seal_impression_char_mask=page_seal_impression_char_mask,
            page_char_height_score_map=page_char_height_score_map,
            page_text_line_mask=page_text_line_mask,
            page_text_line_height_score_map=page_text_line_height_score_map,
        )


page_resizing_step_factory = PipelineStepFactory(PageResizingStep)
