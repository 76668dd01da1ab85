"""Image selector engine: random file from folders, crop or resize.

Capability parity: vkit/engine/image/selector.py:31-105.
"""
import os
from pathlib import Path
from typing import List, Optional, Sequence

import attr
from numpy.random import Generator as RandomGenerator

from ...element import Box, Image, ImageMode
from ...utility import rng_choice
from ..interface import Engine, EngineExecutorFactory, NoneTypeEngineInitResource
from .type import ImageEngineRunConfig


@attr.define
class ImageSelectorEngineInitConfig:
    image_folders: Sequence[str]
    target_image_mode: Optional[ImageMode] = ImageMode.RGB
    force_resize: bool = False


class ImageSelectorEngine(
    Engine[
        ImageSelectorEngineInitConfig,
        NoneTypeEngineInitResource,
        ImageEngineRunConfig,
        Image,
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'selector'

    def __init__(self, init_config, init_resource=None):
        super().__init__(init_config, init_resource)
        self.image_files: List[Path] = []
        for image_folder in self.init_config.image_folders:
            image_fd = Path(os.path.expandvars(os.fspath(image_folder)))
            assert image_fd.exists()
            for ext in ('jpg', 'jpeg', 'png'):
                for pattern in (f'**/*.{ext}', f'**/*.{ext.upper()}'):
                    self.image_files.extend(image_fd.glob(pattern))
        self.image_files.sort()

    def run(self, run_config: ImageEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> Image:
        assert rng is not None

        image_file = rng_choice(rng, self.image_files)
        image = Image.from_file(image_file)

        if self.init_config.target_image_mode:
            image = image.to_target_mode_image(self.init_config.target_image_mode)

        if run_config.disable_resizing:
            assert run_config.height == 0 and run_config.width == 0
            return image

        height = run_config.height
        width = run_config.width
        if not self.init_config.force_resize \
                and height <= image.height and width <= image.width:
            up = int(rng.integers(0, image.height - height + 1))
            left = int(rng.integers(0, image.width - width + 1))
            box = Box(up=up, down=up + height - 1, left=left, right=left + width - 1)
            image = box.extract_image(image)
        else:
            image = image.to_resized_image(
                resized_height=height, resized_width=width
            )
        return image


image_selector_engine_executor_factory = EngineExecutorFactory(ImageSelectorEngine)
