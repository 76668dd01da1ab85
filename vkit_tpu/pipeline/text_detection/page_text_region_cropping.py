"""Text region cropping step.

Capability parity: vkit/pipeline/text_detection/page_text_region_cropping.py:
36-383.  The shapely point STRtree is replaced by a vectorized point-in-box
filter over the label coordinates.
"""
import itertools
from typing import List, Optional, Sequence, Tuple

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ...element import Box, Image, Interpolation, Mask, ScoreMap
from ...mechanism.cropper import Cropper
from ...mechanism.distortion import rotate
from ..interface import PipelineStep, PipelineStepFactory
from .page_cropping import PageCroppingStepOutput
from .page_text_region import PageTextRegionStepOutput
from .page_text_region_label import (
    PageCharRegressionLabel,
    PageCharRegressionLabelTag,
    PageTextRegionLabelStepOutput,
)


@attr.define
class PageTextRegionCroppingStepConfig:
    core_size: int
    pad_size: int
    num_samples_factor_relative_to_num_cropped_pages: float = 1.0
    num_centroid_points_min: int = 10
    num_deviate_points_min: int = 10
    pad_value: int = 0
    enable_downsample_labeling: bool = True
    downsample_labeling_factor: int = 2


@attr.define
class PageTextRegionCroppingStepInput:
    page_cropping_step_output: PageCroppingStepOutput
    page_text_region_step_output: PageTextRegionStepOutput
    page_text_region_label_step_output: PageTextRegionLabelStepOutput


@attr.define
class DownsampledLabel:
    shape: Tuple[int, int]
    page_char_mask: Mask
    page_char_height_score_map: ScoreMap
    page_char_gaussian_score_map: ScoreMap
    page_char_regression_labels: Sequence[PageCharRegressionLabel]
    page_char_bounding_box_mask: Mask
    target_core_box: Box


@attr.define
class CroppedPageTextRegion:
    page_image: Image
    page_char_mask: Mask
    page_char_height_score_map: ScoreMap
    page_char_gaussian_score_map: ScoreMap
    page_char_regression_labels: Sequence[PageCharRegressionLabel]
    page_char_bounding_box_mask: Mask
    target_core_box: Box
    downsampled_label: Optional[DownsampledLabel]


@attr.define
class PageTextRegionCroppingStepOutput:
    cropped_page_text_regions: Sequence[CroppedPageTextRegion]


class LabelPointIndex:
    """Vectorized point-in-box queries over regression label points."""

    def __init__(self, labels: Sequence[PageCharRegressionLabel]):
        self.labels = tuple(labels)
        if self.labels:
            self.np_points = np.asarray(
                [
                    (label.downsampled_label_point_y, label.downsampled_label_point_x)
                    for label in self.labels
                ],
                dtype=np.int64,
            )
        else:
            self.np_points = None

    def query_in_box(self, box: Box) -> List[int]:
        if self.np_points is None:
            return []
        ys = self.np_points[:, 0]
        xs = self.np_points[:, 1]
        hit = (box.up <= ys) & (ys <= box.down) & (box.left <= xs) & (xs <= box.right)
        return [int(idx) for idx in np.nonzero(hit)[0]]


class PageTextRegionCroppingStep(
    PipelineStep[
        PageTextRegionCroppingStepConfig,
        PageTextRegionCroppingStepInput,
        PageTextRegionCroppingStepOutput,
    ]
):

    def sample_cropped_page_text_regions(
        self,
        page_image: Image,
        shape_before_rotate: Tuple[int, int],
        rotate_angle: int,
        page_char_mask: Mask,
        page_char_height_score_map: ScoreMap,
        page_char_gaussian_score_map: ScoreMap,
        page_char_bounding_box_mask: Mask,
        centroid_index: LabelPointIndex,
        deviate_index: LabelPointIndex,
        rng: RandomGenerator,
    ) -> Optional[CroppedPageTextRegion]:
        if rotate_angle != 0:
            # Propose in the pre-rotation frame so crops stay well covered.
            cropper_before_rotate = Cropper.create_from_random_proposal(
                shape=shape_before_rotate,
                core_size=self.config.core_size,
                pad_size=self.config.pad_size,
                pad_value=self.config.pad_value,
                rng=rng,
            )
            center_point_before_rotate = (
                cropper_before_rotate.original_box.get_center_point()
            )
            rotated_result = rotate.distort(
                {'angle': rotate_angle},
                shapable_or_shape=shape_before_rotate,
                point=center_point_before_rotate,
            )
            assert rotated_result.shape == page_image.shape
            center_point = rotated_result.point
            assert center_point
            cropper = Cropper.create_from_center_point(
                shape=page_image.shape,
                core_size=self.config.core_size,
                pad_size=self.config.pad_size,
                pad_value=self.config.pad_value,
                center_point=center_point,
            )
        else:
            cropper = Cropper.create_from_random_proposal(
                shape=page_image.shape,
                core_size=self.config.core_size,
                pad_size=self.config.pad_size,
                pad_value=self.config.pad_value,
                rng=rng,
            )

        centroid_labels = [
            centroid_index.labels[idx]
            for idx in centroid_index.query_in_box(cropper.original_core_box)
        ]
        preserved_char_indices = {label.char_idx for label in centroid_labels}
        deviate_labels = [
            deviate_index.labels[idx]
            for idx in deviate_index.query_in_box(cropper.original_core_box)
            # Drop deviate labels whose centroid got cropped away.
            if deviate_index.labels[idx].char_idx in preserved_char_indices
        ]

        if len(centroid_labels) < self.config.num_centroid_points_min \
                or len(deviate_labels) < self.config.num_deviate_points_min:
            return None

        offset_y = cropper.target_box.up - cropper.original_box.up
        offset_x = cropper.target_box.left - cropper.original_box.left
        shifted_centroid_labels = [
            label.to_shifted_page_char_regression_label(
                offset_y=offset_y, offset_x=offset_x
            ) for label in centroid_labels
        ]
        shifted_deviate_labels = [
            label.to_shifted_page_char_regression_label(
                offset_y=offset_y, offset_x=offset_x
            ) for label in deviate_labels
        ]

        page_image = cropper.crop_image(page_image)
        page_char_mask = cropper.crop_mask(page_char_mask, core_only=True)
        page_char_height_score_map = cropper.crop_score_map(
            page_char_height_score_map, core_only=True
        )
        page_char_gaussian_score_map = cropper.crop_score_map(
            page_char_gaussian_score_map, core_only=True
        )
        page_char_bounding_box_mask = cropper.crop_mask(
            page_char_bounding_box_mask, core_only=True
        )

        downsampled_label: Optional[DownsampledLabel] = None
        if self.config.enable_downsample_labeling:
            factor = self.config.downsample_labeling_factor
            assert cropper.crop_size % factor == 0
            downsampled_size = cropper.crop_size // factor
            assert self.config.pad_size % factor == 0
            assert self.config.core_size % factor == 0
            assert cropper.target_core_box.height \
                == cropper.target_core_box.width == self.config.core_size

            downsampled_pad_size = self.config.pad_size // factor
            downsampled_core_size = self.config.core_size // factor
            downsampled_target_core_box = Box(
                up=downsampled_pad_size,
                down=downsampled_pad_size + downsampled_core_size - 1,
                left=downsampled_pad_size,
                right=downsampled_pad_size + downsampled_core_size - 1,
            )

            def down_mask(mask: Mask) -> Mask:
                return mask.to_box_detached().to_resized_mask(
                    resized_height=downsampled_core_size,
                    resized_width=downsampled_core_size,
                    interpolation=Interpolation.AREA,
                )

            def down_score_map(score_map: ScoreMap) -> ScoreMap:
                return score_map.to_box_detached().to_resized_score_map(
                    resized_height=downsampled_core_size,
                    resized_width=downsampled_core_size,
                    interpolation=Interpolation.AREA,
                )

            downsampled_page_char_regression_labels = [
                label.to_downsampled_page_char_regression_label(factor)
                for label in itertools.chain(
                    shifted_centroid_labels, shifted_deviate_labels
                )
            ]

            downsampled_label = DownsampledLabel(
                shape=(downsampled_size, downsampled_size),
                page_char_mask=down_mask(page_char_mask),
                page_char_height_score_map=down_score_map(page_char_height_score_map),
                page_char_gaussian_score_map=down_score_map(
                    page_char_gaussian_score_map
                ),
                page_char_regression_labels=downsampled_page_char_regression_labels,
                page_char_bounding_box_mask=down_mask(page_char_bounding_box_mask),
                target_core_box=downsampled_target_core_box,
            )

        return CroppedPageTextRegion(
            page_image=page_image,
            page_char_mask=page_char_mask,
            page_char_height_score_map=page_char_height_score_map,
            page_char_gaussian_score_map=page_char_gaussian_score_map,
            page_char_regression_labels=(
                shifted_centroid_labels + shifted_deviate_labels
            ),
            page_char_bounding_box_mask=page_char_bounding_box_mask,
            target_core_box=cropper.target_core_box,
            downsampled_label=downsampled_label,
        )

    def run(self, input: PageTextRegionCroppingStepInput, rng: RandomGenerator):
        num_cropped_pages = len(input.page_cropping_step_output.cropped_pages)

        page_text_region_step_output = input.page_text_region_step_output
        page_image = page_text_region_step_output.page_image
        shape_before_rotate = page_text_region_step_output.shape_before_rotate
        rotate_angle = page_text_region_step_output.rotate_angle

        label_out = input.page_text_region_label_step_output
        page_char_regression_labels = label_out.page_char_regression_labels

        centroid_index = LabelPointIndex([
            label for label in page_char_regression_labels
            if label.tag == PageCharRegressionLabelTag.CENTROID
        ])
        deviate_index = LabelPointIndex([
            label for label in page_char_regression_labels
            if label.tag == PageCharRegressionLabelTag.DEVIATE
        ])

        num_samples = round(
            self.config.num_samples_factor_relative_to_num_cropped_pages
            * num_cropped_pages
        )
        run_count_max = max(3, 2 * num_samples)
        run_count = 0

        cropped_page_text_regions: List[CroppedPageTextRegion] = []
        while len(cropped_page_text_regions) < num_samples \
                and run_count < run_count_max:
            cropped = self.sample_cropped_page_text_regions(
                page_image=page_image,
                shape_before_rotate=shape_before_rotate,
                rotate_angle=rotate_angle,
                page_char_mask=label_out.page_char_mask,
                page_char_height_score_map=label_out.page_char_height_score_map,
                page_char_gaussian_score_map=label_out.page_char_gaussian_score_map,
                page_char_bounding_box_mask=label_out.page_char_bounding_box_mask,
                centroid_index=centroid_index,
                deviate_index=deviate_index,
                rng=rng,
            )
            if cropped:
                cropped_page_text_regions.append(cropped)
            run_count += 1

        return PageTextRegionCroppingStepOutput(
            cropped_page_text_regions=cropped_page_text_regions,
        )


page_text_region_cropping_step_factory = PipelineStepFactory(PageTextRegionCroppingStep)
