"""Image combiner engine: mosaic of photos with prioritized segment packing
and edge smoothing.

Capability parity: vkit/engine/image/combiner.py:35-347.
"""
import bisect
import heapq
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ...element import Image, ImageMode, Mask
from ...mechanism.distortion import rotate
from ...ops import blur as blur_ops
from ...utility import read_json_file, rng_choice
from ..interface import Engine, EngineExecutorFactory, NoneTypeEngineInitResource
from .type import ImageEngineRunConfig


@attr.define(frozen=True)
class ImageMeta:
    image_file: str
    grayscale_mean: float
    grayscale_std: float


class FolderTree:
    IMAGE = 'image'
    METAS_JSON = 'metas.json'


def load_image_metas_from_folder(folder: str) -> List[ImageMeta]:
    in_fd = Path(os.path.expandvars(folder))
    assert in_fd.exists()
    image_fd = in_fd / FolderTree.IMAGE
    metas_json = in_fd / FolderTree.METAS_JSON
    assert image_fd.exists() and metas_json.exists()

    image_metas: List[ImageMeta] = []
    for meta in read_json_file(metas_json):
        image_file = image_fd / meta['image_file']
        assert image_file.exists()
        image_metas.append(
            ImageMeta(
                image_file=str(image_file),
                grayscale_mean=meta['grayscale_mean'],
                grayscale_std=meta['grayscale_std'],
            )
        )
    return image_metas


@attr.define
class ImageCombinerEngineInitConfig:
    image_meta_folder: str
    target_image_mode: ImageMode = ImageMode.RGB
    enable_cache: bool = False
    prob_use_only_the_anchor_image: float = 0.7
    prob_rotate_image: float = 0.5
    sigma: float = 3.0
    init_segment_width_min_ratio: float = 0.25
    gaussian_blur_kernel_size: int = 5


@attr.define(order=True)
class PrioritizedSegment:
    y: int = attr.field(order=True)
    left: int = attr.field(order=False)
    right: int = attr.field(order=False)


class ImageCombinerEngine(
    Engine[
        ImageCombinerEngineInitConfig,
        NoneTypeEngineInitResource,
        ImageEngineRunConfig,
        Image,
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'combiner'

    def __init__(self, init_config, init_resource=None):
        super().__init__(init_config, init_resource)
        self.image_metas = sorted(
            load_image_metas_from_folder(init_config.image_meta_folder),
            key=lambda meta: meta.grayscale_mean,
        )
        self.image_metas_grayscale_means = [
            meta.grayscale_mean for meta in self.image_metas
        ]
        self.enable_cache = init_config.enable_cache
        self.image_file_to_cache_image: Dict[str, Image] = {}

    def sample_image_metas_based_on_random_anchor(
        self,
        run_config: ImageEngineRunConfig,
        rng: RandomGenerator,
    ) -> Sequence[ImageMeta]:
        anchor = rng_choice(rng, self.image_metas)
        if rng.random() < self.init_config.prob_use_only_the_anchor_image:
            return [anchor]

        begin = round(anchor.grayscale_mean - self.init_config.sigma * anchor.grayscale_std)
        end = round(anchor.grayscale_mean + self.init_config.sigma * anchor.grayscale_std)
        index_begin = bisect.bisect_left(self.image_metas_grayscale_means, begin)
        index_end = bisect.bisect_right(self.image_metas_grayscale_means, end)
        image_metas = self.image_metas[index_begin:index_end]
        assert image_metas
        return image_metas

    @classmethod
    def fill_np_edge_mask(
        cls, np_edge_mask, height, width, half_kernel, up, down, left, right
    ):
        # Band each pasted tile border for later smoothing.
        np_edge_mask[
            max(0, up - half_kernel):min(height - 1, up + half_kernel) + 1,
            left:right + 1,
        ] = 1
        np_edge_mask[
            max(0, down - half_kernel):min(height - 1, down + half_kernel) + 1,
            left:right + 1,
        ] = 1
        np_edge_mask[
            up:down + 1,
            max(0, left - half_kernel):min(width - 1, left + half_kernel) + 1,
        ] = 1
        np_edge_mask[
            up:down + 1,
            max(0, right - half_kernel):min(width - 1, right + half_kernel) + 1,
        ] = 1

    def _load_segment_image(self, image_meta, image_file_to_rotate_flag, rng):
        if self.enable_cache and image_meta.image_file in self.image_file_to_cache_image:
            return self.image_file_to_cache_image[image_meta.image_file]

        segment_image = Image.from_file(image_meta.image_file).to_target_mode_image(
            self.init_config.target_image_mode
        )
        if image_meta.image_file not in image_file_to_rotate_flag:
            image_file_to_rotate_flag[image_meta.image_file] = (
                rng.random() < self.init_config.prob_rotate_image
            )
        if image_file_to_rotate_flag[image_meta.image_file]:
            segment_image = rotate.distort_image({'angle': 90}, image=segment_image)

        if self.enable_cache:
            self.image_file_to_cache_image[image_meta.image_file] = segment_image
        return segment_image

    def synthesize_image(
        self,
        run_config: ImageEngineRunConfig,
        image_metas: Sequence[ImageMeta],
        rng: RandomGenerator,
    ) -> Image:
        height = run_config.height
        width = run_config.width

        mat = np.zeros((height, width, 3), dtype=np.uint8)
        edge_mask = Mask.from_shape((height, width))
        half_kernel = self.init_config.gaussian_blur_kernel_size // 2 + 1

        # Initial vertical segments.
        priority_queue: List[PrioritizedSegment] = []
        segment_width_min = int(
            np.clip(
                round(self.init_config.init_segment_width_min_ratio * width),
                1, width - 1,
            )
        )
        left = 0
        while left + segment_width_min - 1 < width:
            right = int(rng.integers(left + segment_width_min - 1, width))
            if right + 1 - left < segment_width_min or width - right - 1 < segment_width_min:
                break
            priority_queue.append(PrioritizedSegment(y=0, left=left, right=right))
            left = right + 1
        if left < width:
            priority_queue.append(PrioritizedSegment(y=0, left=left, right=width - 1))

        image_file_to_rotate_flag: Dict[str, bool] = {}

        while priority_queue:
            cur_segment = heapq.heappop(priority_queue)

            # Merge adjacent same-height segments.
            segments: List[PrioritizedSegment] = []
            while priority_queue and priority_queue[0].y == cur_segment.y:
                segments.append(heapq.heappop(priority_queue))
            if segments:
                segments.append(cur_segment)
                segments.sort(key=lambda seg: seg.left)
                cur_idx = next(
                    idx for idx, seg in enumerate(segments)
                    if seg.left == cur_segment.left and seg.right == cur_segment.right
                )
                begin = cur_idx
                while begin > 0 and segments[begin - 1].right + 1 == segments[begin].left:
                    begin -= 1
                end = cur_idx
                while end + 1 < len(segments) \
                        and segments[end].right + 1 == segments[end + 1].left:
                    end += 1
                if begin < end:
                    cur_segment.left = segments[begin].left
                    cur_segment.right = segments[end].right
                for segment in segments[:begin]:
                    heapq.heappush(priority_queue, segment)
                for segment in segments[end + 1:]:
                    heapq.heappush(priority_queue, segment)

            image_meta = rng_choice(rng, image_metas)
            segment_image = self._load_segment_image(
                image_meta, image_file_to_rotate_flag, rng
            )

            up = cur_segment.y
            down = min(height - 1, up + segment_image.height - 1)
            left = cur_segment.left
            right = min(cur_segment.right, left + segment_image.width - 1)
            mat[up:down + 1, left:right + 1] = \
                segment_image.mat[:down + 1 - up, :right + 1 - left]

            with edge_mask.writable_context:
                self.fill_np_edge_mask(
                    edge_mask.mat, height, width, half_kernel, up, down, left, right
                )

            if right == cur_segment.right:
                cur_segment.y = down + 1
                if cur_segment.y < height:
                    heapq.heappush(priority_queue, cur_segment)
            else:
                new_segment = PrioritizedSegment(y=down + 1, left=left, right=right)
                if new_segment.y < height:
                    heapq.heappush(priority_queue, new_segment)
                cur_segment.left = right + 1
                heapq.heappush(priority_queue, cur_segment)

        # Smooth the seams.
        sigma = half_kernel / 3
        blurred = blur_ops.gaussian_blur_np(
            mat, sigma, self.init_config.gaussian_blur_kernel_size
        )
        edge_mask.fill_np_array(mat, blurred)

        return Image(mat=mat)

    def run(self, run_config: ImageEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> Image:
        assert rng is not None
        assert not run_config.disable_resizing
        image_metas = self.sample_image_metas_based_on_random_anchor(run_config, rng)
        return self.synthesize_image(run_config, image_metas, rng)


image_combiner_engine_executor_factory = EngineExecutorFactory(ImageCombinerEngine)
