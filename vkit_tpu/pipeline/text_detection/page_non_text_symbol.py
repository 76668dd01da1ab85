"""Page non-text symbol step.

Capability parity: vkit/pipeline/text_detection/page_non_text_symbol.py:28-190.
"""
from enum import Enum, unique
from typing import List, Sequence, Union

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ...element import Box, Image, ImageMode
from ...engine.image import image_selector_engine_executor_factory
from ...utility import normalize_to_keys_and_probs, rng_choice
from ..interface import PipelineStep, PipelineStepFactory
from .page_layout import PageLayoutStepOutput


@attr.define
class PageNonTextSymbolStepConfig:
    symbol_image_folders: Sequence[str]

    weight_color_grayscale: float = 0.9
    color_grayscale_min: int = 0
    color_grayscale_max: int = 75
    weight_color_red: float = 0.04
    weight_color_green: float = 0.02
    weight_color_blue: float = 0.04
    color_rgb_min: int = 128
    color_rgb_max: int = 255


@attr.define
class PageNonTextSymbolStepInput:
    page_layout_step_output: PageLayoutStepOutput


@attr.define
class PageNonTextSymbolStepOutput:
    images: Sequence[Image]
    boxes: Sequence[Box]
    alphas: Sequence[Union[np.ndarray, float]]


@unique
class NonTextSymbolColorMode(Enum):
    GRAYSCALE = 'grayscale'
    RED = 'red'
    GREEN = 'green'
    BLUE = 'blue'


class PageNonTextSymbolStep(
    PipelineStep[
        PageNonTextSymbolStepConfig,
        PageNonTextSymbolStepInput,
        PageNonTextSymbolStepOutput,
    ]
):

    def __init__(self, config: PageNonTextSymbolStepConfig):
        super().__init__(config)
        self.symbol_image_selector_engine_executor = (
            image_selector_engine_executor_factory.create({
                'image_folders': self.config.symbol_image_folders,
                'target_image_mode': None,
                'force_resize': True,
            })
        )
        self.color_modes, self.color_modes_probs = normalize_to_keys_and_probs([
            (NonTextSymbolColorMode.GRAYSCALE, self.config.weight_color_grayscale),
            (NonTextSymbolColorMode.RED, self.config.weight_color_red),
            (NonTextSymbolColorMode.GREEN, self.config.weight_color_green),
            (NonTextSymbolColorMode.BLUE, self.config.weight_color_blue),
        ])

    def run(self, input: PageNonTextSymbolStepInput, rng: RandomGenerator):
        page_layout = input.page_layout_step_output.page_layout

        images: List[Image] = []
        boxes: List[Box] = []
        alphas: List[Union[np.ndarray, float]] = []

        for layout_non_text_symbol in page_layout.layout_non_text_symbols:
            box = layout_non_text_symbol.box
            image = self.symbol_image_selector_engine_executor.run(
                {'height': box.height, 'width': box.width}, rng
            )
            alpha: Union[np.ndarray, float] = layout_non_text_symbol.alpha

            if image.mode == ImageMode.RGBA:
                # Alpha channel scaled to the layout alpha.
                np_alpha = image.mat[:, :, 3].astype(np.float32) / 255
                np_alpha_max = np_alpha.max()
                np_alpha *= layout_non_text_symbol.alpha
                if np_alpha_max > 0:
                    np_alpha /= np_alpha_max
                alpha = np_alpha
                image = Image(mat=image.mat[:, :, :3])

            elif image.mode == ImageMode.GRAYSCALE:
                # Use the grayscale ink as a mask and recolor.
                alpha = (image.mat > 0).astype(np.float32)
                alpha *= layout_non_text_symbol.alpha

                color_mode = rng_choice(
                    rng, self.color_modes, probs=self.color_modes_probs
                )
                if color_mode == NonTextSymbolColorMode.GRAYSCALE:
                    grayscale_value = int(
                        rng.integers(
                            self.config.color_grayscale_min,
                            self.config.color_grayscale_max + 1,
                        )
                    )
                    symbol_color = (grayscale_value,) * 3
                else:
                    rgb_value = int(
                        rng.integers(
                            self.config.color_rgb_min, self.config.color_rgb_max + 1
                        )
                    )
                    if color_mode == NonTextSymbolColorMode.RED:
                        symbol_color = (rgb_value, 0, 0)
                    elif color_mode == NonTextSymbolColorMode.GREEN:
                        symbol_color = (0, rgb_value, 0)
                    elif color_mode == NonTextSymbolColorMode.BLUE:
                        symbol_color = (0, 0, rgb_value)
                    else:
                        raise NotImplementedError()
                image = Image.from_shapable(image, value=symbol_color)

            else:
                raise NotImplementedError()

            images.append(image)
            boxes.append(layout_non_text_symbol.box)
            alphas.append(alpha)

        return PageNonTextSymbolStepOutput(images=images, boxes=boxes, alphas=alphas)


page_non_text_symbol_step_factory = PipelineStepFactory(PageNonTextSymbolStep)
