"""Page seal impression step.

Capability parity: vkit/pipeline/text_detection/page_seal_impression.py:29-100
(class name keeps the reference's triple-s spelling for registry parity).
"""
from typing import Any, List, Mapping, Sequence, Union

import attr
from numpy.random import Generator as RandomGenerator

from ...element import Box
from ...engine.seal_impression import (
    SealImpression,
    seal_impression_engine_executor_aggregator_factory,
)
from ...utility import PathType
from ..interface import PipelineStep, PipelineStepFactory
from .page_layout import PageLayoutStepOutput


@attr.define
class PageSealImpresssionStepConfig:
    seal_impression_configs: Union[Sequence[Mapping[str, Any]], PathType]


@attr.define
class PageSealImpresssionStepInput:
    page_layout_step_output: PageLayoutStepOutput


@attr.define
class PageSealImpresssionStepOutput:
    seal_impressions: Sequence[SealImpression]
    boxes: Sequence[Box]
    angles: Sequence[int]


class PageSealImpresssionStep(
    PipelineStep[
        PageSealImpresssionStepConfig,
        PageSealImpresssionStepInput,
        PageSealImpresssionStepOutput,
    ]
):

    def __init__(self, config: PageSealImpresssionStepConfig):
        super().__init__(config)
        self.seal_impression_engine_executor_aggregator = (
            seal_impression_engine_executor_aggregator_factory.create(
                self.config.seal_impression_configs
            )
        )

    def run(self, input: PageSealImpresssionStepInput, rng: RandomGenerator):
        page_layout = input.page_layout_step_output.page_layout

        seal_impressions: List[SealImpression] = []
        boxes: List[Box] = []
        angles: List[int] = []
        for layout_seal_impression in page_layout.layout_seal_impressions:
            box = layout_seal_impression.box
            seal_impressions.append(
                self.seal_impression_engine_executor_aggregator.run(
                    {'height': box.height, 'width': box.width}, rng
                )
            )
            boxes.append(box)
            angles.append(layout_seal_impression.angle)

        return PageSealImpresssionStepOutput(
            seal_impressions=seal_impressions,
            boxes=boxes,
            angles=angles,
        )


page_seal_impresssion_step_factory = PipelineStepFactory(PageSealImpresssionStep)
