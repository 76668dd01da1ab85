"""Page background step.

Capability parity: vkit/pipeline/text_detection/page_background.py:32-110.
"""
from enum import Enum, unique
from typing import Any, Mapping, Sequence, Union

import attr
from numpy.random import Generator as RandomGenerator

from ...element import Image
from ...engine.image import image_engine_executor_aggregator_factory
from ...utility import PathType, normalize_to_keys_and_probs, rng_choice
from ..interface import PipelineStep, PipelineStepFactory
from .page_shape import PageShapeStepOutput


@attr.define
class PageBackgroundStepConfig:
    image_configs: Union[Sequence[Mapping[str, Any]], PathType]
    weight_image: float = 0.8
    weight_random_grayscale: float = 0.2
    grayscale_min: int = 127
    grayscale_max: int = 255


@attr.define
class PageBackgroundStepInput:
    page_shape_step_output: PageShapeStepOutput


@attr.define
class PageBackgroundStepOutput:
    background_image: Image


@unique
class PageBackgroundStepKey(Enum):
    IMAGE = 'image'
    RANDOM_GRAYSCALE = 'random_grayscale'


class PageBackgroundStep(
    PipelineStep[
        PageBackgroundStepConfig,
        PageBackgroundStepInput,
        PageBackgroundStepOutput,
    ]
):

    def __init__(self, config: PageBackgroundStepConfig):
        super().__init__(config)
        self.image_engine_executor_aggregator = (
            image_engine_executor_aggregator_factory.create(self.config.image_configs)
        )
        self.keys, self.probs = normalize_to_keys_and_probs([
            (PageBackgroundStepKey.IMAGE, self.config.weight_image),
            (PageBackgroundStepKey.RANDOM_GRAYSCALE, self.config.weight_random_grayscale),
        ])

    def run(self, input: PageBackgroundStepInput, rng: RandomGenerator):
        height = input.page_shape_step_output.height
        width = input.page_shape_step_output.width

        key = rng_choice(rng, self.keys, probs=self.probs)
        if key == PageBackgroundStepKey.IMAGE:
            background_image = self.image_engine_executor_aggregator.run(
                {'height': height, 'width': width}, rng
            )
        elif key == PageBackgroundStepKey.RANDOM_GRAYSCALE:
            grayscale_value = int(
                rng.integers(self.config.grayscale_min, self.config.grayscale_max + 1)
            )
            background_image = Image.from_shape(
                (height, width), num_channels=3, value=grayscale_value
            )
        else:
            raise NotImplementedError()

        return PageBackgroundStepOutput(background_image=background_image)


page_background_step_factory = PipelineStepFactory(PageBackgroundStep)
