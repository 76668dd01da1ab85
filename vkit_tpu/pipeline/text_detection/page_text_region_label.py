"""Text region label step: char regression labels + heatmap + masks.

Capability parity: vkit/pipeline/text_detection/page_text_region_label.py:
42-648 (PageCharRegressionLabel with corner vectors / clockwise angle
distribution validity, deviate point sampling via perspective transform,
gaussian char heatmap, char mask, height score map).
"""
import logging
import math
from enum import Enum, unique
from typing import Any, List, Mapping, Optional, Sequence, Tuple

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator
from sklearn.neighbors import KDTree

from ...element import Box, Mask, Point, PointList, Polygon, ScoreMap
from ...engine.char_heatmap import (
    CharHeatmapDefaultEngineInitConfig,
    char_heatmap_default_engine_executor_factory,
)
from ...engine.char_mask import (
    CharMaskEngineRunConfig,
    char_mask_engine_executor_aggregator_factory,
)
from ...ops import warp as warp_ops
from ...utility import normalize_to_probs
from ..interface import PipelineStep, PipelineStepFactory
from .page_text_region import PageTextRegionStepOutput

logger = logging.getLogger(__name__)


@attr.define
class PageTextRegionLabelStepConfig:
    char_heatmap_default_engine_init_config: CharHeatmapDefaultEngineInitConfig = (
        attr.field(factory=CharHeatmapDefaultEngineInitConfig)
    )
    char_mask_engine_config: Mapping[str, Any] = attr.field(
        factory=lambda: {'type': 'default'}
    )
    # 1 centroid + n deviate points.
    num_deviate_char_regression_labels: int = 1
    num_deviate_char_regression_labels_candiates_factor: int = 3


@attr.define
class PageTextRegionLabelStepInput:
    page_text_region_step_output: PageTextRegionStepOutput


@unique
class PageCharRegressionLabelTag(Enum):
    CENTROID = 'centroid'
    DEVIATE = 'deviate'


PI = float(np.pi)
TWO_PI = float(2 * np.pi)


@attr.define
class Vector:
    y: float
    x: float
    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    @property
    def distance(self) -> float:
        if 'distance' not in self._cache:
            self._cache['distance'] = math.hypot(self.x, self.y)
        return self._cache['distance']

    @property
    def theta(self) -> float:
        if 'theta' not in self._cache:
            self._cache['theta'] = float(np.arctan2(self.y, self.x)) % TWO_PI
        return self._cache['theta']

    @classmethod
    def calculate_theta_delta(
        cls,
        vector0: 'Vector',
        vector1: 'Vector',
        clockwise: bool = False,
    ) -> float:
        theta_delta = (vector1.theta - vector0.theta + PI) % TWO_PI - PI
        if clockwise and theta_delta < 0:
            theta_delta += TWO_PI
        return theta_delta

    def dot(self, other: 'Vector') -> float:
        return self.x * other.x + self.y * other.y


@attr.define
class PageCharRegressionLabel:
    char_idx: int
    tag: PageCharRegressionLabelTag
    label_point_smooth_y: float
    label_point_smooth_x: float
    downsampled_label_point_y: int
    downsampled_label_point_x: int
    up_left: Point
    up_right: Point
    down_right: Point
    down_left: Point

    is_downsampled: bool = False
    downsample_labeling_factor: int = 1

    _cache: dict = attr.field(factory=dict, repr=False, init=False)

    @property
    def corner_points(self):
        yield from (self.up_left, self.up_right, self.down_right, self.down_left)

    @classmethod
    def get_bounding_orientation_idx(cls, down_left: Point, down_right: Point) -> int:
        # Which side of the bounding box the "down" edge faces:
        #        0
        #  +-----------+
        #  |           |
        # 2|           |3
        #  |           |
        #  +-----------+
        #        1
        vector = Vector(
            y=down_right.smooth_y - down_left.smooth_y,
            x=down_right.smooth_x - down_left.smooth_x,
        )
        factor = vector.theta / PI
        if 1.75 <= factor or factor < 0.25:
            return 1
        if 0.25 <= factor < 0.75:
            return 2
        if 0.75 <= factor < 1.25:
            return 0
        if 1.25 <= factor:
            return 3
        raise RuntimeError()

    def _ensure_geometry(self):
        cache = self._cache
        if 'valid' in cache:
            return
        cache['up_left_vector'] = Vector(
            y=self.up_left.smooth_y - self.label_point_smooth_y,
            x=self.up_left.smooth_x - self.label_point_smooth_x,
        )
        cache['up_right_vector'] = Vector(
            y=self.up_right.smooth_y - self.label_point_smooth_y,
            x=self.up_right.smooth_x - self.label_point_smooth_x,
        )
        cache['down_right_vector'] = Vector(
            y=self.down_right.smooth_y - self.label_point_smooth_y,
            x=self.down_right.smooth_x - self.label_point_smooth_x,
        )
        cache['down_left_vector'] = Vector(
            y=self.down_left.smooth_y - self.label_point_smooth_y,
            x=self.down_left.smooth_x - self.label_point_smooth_x,
        )

        angles = [
            Vector.calculate_theta_delta(
                cache['up_left_vector'], cache['up_right_vector'], clockwise=True
            ),
            Vector.calculate_theta_delta(
                cache['up_right_vector'], cache['down_right_vector'], clockwise=True
            ),
            Vector.calculate_theta_delta(
                cache['down_right_vector'], cache['down_left_vector'], clockwise=True
            ),
            Vector.calculate_theta_delta(
                cache['down_left_vector'], cache['up_left_vector'], clockwise=True
            ),
        ]
        cache['angles'] = angles
        # Valid iff the label point lies inside the quad: the clockwise
        # corner angles must sum to 2*pi (within ~4 degrees).
        cache['valid'] = math.isclose(sum(angles), TWO_PI, rel_tol=0.012)
        cache['clockwise_angle_distribution'] = normalize_to_probs(angles)

    @property
    def bounding_smooth_up(self) -> float:
        return min(point.smooth_y for point in self.corner_points)

    @property
    def bounding_smooth_down(self) -> float:
        return max(point.smooth_y for point in self.corner_points)

    @property
    def bounding_smooth_left(self) -> float:
        return min(point.smooth_x for point in self.corner_points)

    @property
    def bounding_smooth_right(self) -> float:
        return max(point.smooth_x for point in self.corner_points)

    @property
    def bounding_center_point(self) -> Point:
        return Point.create(
            y=(self.bounding_smooth_up + self.bounding_smooth_down) / 2,
            x=(self.bounding_smooth_left + self.bounding_smooth_right) / 2,
        )

    @property
    def bounding_smooth_shape(self):
        return (
            self.bounding_smooth_down - self.bounding_smooth_up,
            self.bounding_smooth_right - self.bounding_smooth_left,
        )

    @property
    def bounding_orientation_idx(self) -> int:
        return self.get_bounding_orientation_idx(
            down_left=self.down_left, down_right=self.down_right
        )

    @property
    def valid(self) -> bool:
        self._ensure_geometry()
        return self._cache['valid']

    def copy(self, with_non_bounding_related_lazy_fields: bool = False):
        copied = attr.evolve(self)
        if with_non_bounding_related_lazy_fields:
            copied._cache.update(self._cache)
        return copied

    def to_shifted_page_char_regression_label(
        self, offset_y: int, offset_x: int
    ) -> 'PageCharRegressionLabel':
        assert self.valid and not self.is_downsampled
        # A pure shift preserves the corner-vector geometry.
        shifted = self.copy(with_non_bounding_related_lazy_fields=True)
        shifted.label_point_smooth_y = self.label_point_smooth_y + offset_y
        shifted.label_point_smooth_x = self.label_point_smooth_x + offset_x
        shifted.downsampled_label_point_y = int(shifted.label_point_smooth_y)
        shifted.downsampled_label_point_x = int(shifted.label_point_smooth_x)
        shifted.up_left = self.up_left.to_shifted_point(offset_y=offset_y, offset_x=offset_x)
        shifted.up_right = self.up_right.to_shifted_point(
            offset_y=offset_y, offset_x=offset_x
        )
        shifted.down_right = self.down_right.to_shifted_point(
            offset_y=offset_y, offset_x=offset_x
        )
        shifted.down_left = self.down_left.to_shifted_point(
            offset_y=offset_y, offset_x=offset_x
        )
        return shifted

    def to_downsampled_page_char_regression_label(
        self, downsample_labeling_factor: int
    ) -> 'PageCharRegressionLabel':
        assert self.valid and not self.is_downsampled
        downsampled = self.copy(with_non_bounding_related_lazy_fields=True)
        downsampled.is_downsampled = True
        downsampled.downsample_labeling_factor = downsample_labeling_factor
        downsampled.downsampled_label_point_y = int(
            self.label_point_smooth_y // downsample_labeling_factor
        )
        downsampled.downsampled_label_point_x = int(
            self.label_point_smooth_x // downsample_labeling_factor
        )
        return downsampled

    def generate_up_left_offsets(self):
        self._ensure_geometry()
        up_left_vector = self._cache['up_left_vector']
        return up_left_vector.y, up_left_vector.x

    def generate_clockwise_angle_distribution(self):
        self._ensure_geometry()
        return self._cache['clockwise_angle_distribution']

    def generate_clockwise_distances(self):
        self._ensure_geometry()
        return (
            self._cache['up_left_vector'].distance,
            self._cache['up_right_vector'].distance,
            self._cache['down_right_vector'].distance,
            self._cache['down_left_vector'].distance,
        )


@attr.define
class PageTextRegionLabelStepOutput:
    page_char_mask: Mask
    page_char_height_score_map: ScoreMap
    page_char_gaussian_score_map: ScoreMap
    page_char_regression_labels: Sequence[PageCharRegressionLabel]
    page_char_bounding_box_mask: Mask


class PageTextRegionLabelStep(
    PipelineStep[
        PageTextRegionLabelStepConfig,
        PageTextRegionLabelStepInput,
        PageTextRegionLabelStepOutput,
    ]
):

    def __init__(self, config: PageTextRegionLabelStepConfig):
        super().__init__(config)
        self.char_heatmap_default_engine_executor = (
            char_heatmap_default_engine_executor_factory.create(
                self.config.char_heatmap_default_engine_init_config
            )
        )
        self.char_mask_engine_executor = (
            char_mask_engine_executor_aggregator_factory.create_engine_executor(
                self.config.char_mask_engine_config
            )
        )

    def generate_page_char_mask(
        self,
        shape: Tuple[int, int],
        page_inactive_mask: Mask,
        page_char_polygons: Sequence[Polygon],
        page_text_region_polygons: Sequence[Polygon],
        page_char_polygon_text_region_polygon_indices: Sequence[int],
    ):
        height, width = shape
        result = self.char_mask_engine_executor.run(
            CharMaskEngineRunConfig(
                height=height,
                width=width,
                char_polygons=page_char_polygons,
                char_bounding_polygons=[
                    page_text_region_polygons[idx]
                    for idx in page_char_polygon_text_region_polygon_indices
                ],
            ),
        )
        page_inactive_mask.fill_mask(result.combined_chars_mask, 0)
        return result.combined_chars_mask, result.char_masks

    @classmethod
    def generate_page_char_height_score_map(
        cls,
        shape: Tuple[int, int],
        page_inactive_mask: Mask,
        page_char_polygons: Sequence[Polygon],
        fill_score_map_char_masks: Optional[Sequence[Mask]],
    ) -> ScoreMap:
        rectangular_heights = [
            char_polygon.get_rectangular_height() for char_polygon in page_char_polygons
        ]
        sorted_indices = tuple(reversed(np.asarray(rectangular_heights).argsort()))

        page_char_height_score_map = ScoreMap.from_shape(shape, is_prob=False)
        for idx in sorted_indices:
            idx = int(idx)
            if fill_score_map_char_masks is None:
                page_char_polygons[idx].fill_score_map(
                    page_char_height_score_map, value=rectangular_heights[idx]
                )
            else:
                fill_score_map_char_masks[idx].fill_score_map(
                    page_char_height_score_map, value=rectangular_heights[idx]
                )
        page_inactive_mask.fill_score_map(page_char_height_score_map, 0.0)
        return page_char_height_score_map

    def generate_page_char_gaussian_score_map(
        self,
        shape: Tuple[int, int],
        page_char_polygons: Sequence[Polygon],
    ) -> ScoreMap:
        height, width = shape
        char_heatmap = self.char_heatmap_default_engine_executor.run({
            'height': height,
            'width': width,
            'char_polygons': page_char_polygons,
        })
        return char_heatmap.score_map

    def generate_page_char_regression_labels(
        self,
        shape: Tuple[int, int],
        page_char_polygons: Sequence[Polygon],
        rng: RandomGenerator,
    ) -> List[PageCharRegressionLabel]:
        page_height, page_width = shape

        center_points = PointList()
        for polygon in page_char_polygons:
            center_points.append(polygon.get_center_point())
        kd_tree = KDTree(center_points.to_np_array())

        page_char_regression_labels: List[PageCharRegressionLabel] = []

        for char_idx, (polygon, center_point) in enumerate(
            zip(page_char_polygons, center_points)
        ):
            assert polygon.num_points == 4
            up_left, up_right, down_right, down_left = polygon.points

            # 1. Centroid label (must be valid).
            label = PageCharRegressionLabel(
                char_idx=char_idx,
                tag=PageCharRegressionLabelTag.CENTROID,
                label_point_smooth_y=center_point.smooth_y,
                label_point_smooth_x=center_point.smooth_x,
                downsampled_label_point_y=center_point.y,
                downsampled_label_point_x=center_point.x,
                up_left=up_left,
                up_right=up_right,
                down_right=down_right,
                down_left=down_left,
            )
            assert label.valid
            page_char_regression_labels.append(label)

            # 2. Deviate labels.
            if self.config.num_deviate_char_regression_labels <= 0:
                continue

            bounding_box = polygon.bounding_box
            if bounding_box.height <= 2 or bounding_box.width <= 2:
                continue

            deviate_points_in_bounding_box = PointList()
            for _ in range(
                self.config.num_deviate_char_regression_labels_candiates_factor
                * self.config.num_deviate_char_regression_labels
            ):
                y = int(rng.integers(1, bounding_box.height - 1))
                x = int(rng.integers(1, bounding_box.width - 1))
                deviate_points_in_bounding_box.append(Point.create(y=y, x=x))

            # Map bounding-box samples into the (possibly skewed) quad.
            np_src_points = np.asarray(
                [
                    (0, 0),
                    (bounding_box.width - 1, 0),
                    (bounding_box.width - 1, bounding_box.height - 1),
                    (0, bounding_box.height - 1),
                ],
                dtype=np.float64,
            )
            np_dst_points = polygon.internals.np_self_relative_points.astype(np.float64)
            trans_mat = warp_ops.solve_perspective(np_src_points, np_dst_points)

            deviate_points = PointList()
            np_deviate = warp_ops.affine_np_points(
                trans_mat.astype(np.float32),
                deviate_points_in_bounding_box.to_point_tuple().to_smooth_np_array(),
            )
            for dev_x, dev_y in np_deviate:
                shifted_deviate_point = Point.create(y=float(dev_y), x=float(dev_x))
                y = bounding_box.up + shifted_deviate_point.smooth_y
                x = bounding_box.left + shifted_deviate_point.smooth_x
                y = float(np.clip(y, 0, page_height - 1))
                x = float(np.clip(x, 0, page_width - 1))
                deviate_points.append(Point.create(y=y, x=x))

            # Drop samples whose nearest char center is another char.
            _, np_kd_nbr_indices = kd_tree.query(deviate_points.to_np_array())
            preserve_flags = [
                idx == char_idx for idx in np_kd_nbr_indices[:, 0].tolist()
            ]

            num_valid = 0
            for deviate_point, preserve_flag in zip(deviate_points, preserve_flags):
                if num_valid >= self.config.num_deviate_char_regression_labels:
                    break
                if not preserve_flag:
                    continue
                label = PageCharRegressionLabel(
                    char_idx=char_idx,
                    tag=PageCharRegressionLabelTag.DEVIATE,
                    label_point_smooth_y=deviate_point.smooth_y,
                    label_point_smooth_x=deviate_point.smooth_x,
                    downsampled_label_point_y=deviate_point.y,
                    downsampled_label_point_x=deviate_point.x,
                    up_left=up_left,
                    up_right=up_right,
                    down_right=down_right,
                    down_left=down_left,
                )
                if label.valid:
                    page_char_regression_labels.append(label)
                    num_valid += 1

            if num_valid < self.config.num_deviate_char_regression_labels:
                logger.warning(
                    f'Cannot sample enough deviate labels for char_polygon={polygon}'
                )

        return page_char_regression_labels

    def generate_page_char_bounding_box_mask(
        self,
        shape: Tuple[int, int],
        page_char_regression_labels: Sequence[PageCharRegressionLabel],
    ) -> Mask:
        page_char_bounding_box_mask = Mask.from_shape(shape)
        height, width = shape
        for label in page_char_regression_labels:
            box = Box(
                up=max(0, math.floor(label.bounding_smooth_up)),
                down=min(height - 1, math.ceil(label.bounding_smooth_down)),
                left=max(0, math.floor(label.bounding_smooth_left)),
                right=min(width - 1, math.ceil(label.bounding_smooth_right)),
            )
            if box.valid:
                box.fill_mask(page_char_bounding_box_mask)
        return page_char_bounding_box_mask

    def run(self, input: PageTextRegionLabelStepInput, rng: RandomGenerator):
        out = input.page_text_region_step_output
        page_image = out.page_image
        page_active_mask = out.page_active_mask
        page_char_polygons = out.page_char_polygons
        page_text_region_polygons = out.page_text_region_polygons
        page_char_polygon_text_region_polygon_indices = (
            out.page_char_polygon_text_region_polygon_indices
        )

        page_inactive_mask = page_active_mask.to_inverted_mask()
        page_char_mask, fill_score_map_char_masks = self.generate_page_char_mask(
            shape=page_image.shape,
            page_inactive_mask=page_inactive_mask,
            page_char_polygons=page_char_polygons,
            page_text_region_polygons=page_text_region_polygons,
            page_char_polygon_text_region_polygon_indices=(
                page_char_polygon_text_region_polygon_indices
            ),
        )

        page_char_height_score_map = self.generate_page_char_height_score_map(
            shape=page_image.shape,
            page_inactive_mask=page_inactive_mask,
            page_char_polygons=page_char_polygons,
            fill_score_map_char_masks=fill_score_map_char_masks,
        )

        page_char_gaussian_score_map = self.generate_page_char_gaussian_score_map(
            page_image.shape, page_char_polygons
        )

        page_char_regression_labels = self.generate_page_char_regression_labels(
            page_image.shape, page_char_polygons, rng
        )

        page_char_bounding_box_mask = self.generate_page_char_bounding_box_mask(
            page_image.shape, page_char_regression_labels
        )

        return PageTextRegionLabelStepOutput(
            page_char_mask=page_char_mask,
            page_char_height_score_map=page_char_height_score_map,
            page_char_gaussian_score_map=page_char_gaussian_score_map,
            page_char_regression_labels=page_char_regression_labels,
            page_char_bounding_box_mask=page_char_bounding_box_mask,
        )


page_text_region_label_step_factory = PipelineStepFactory(PageTextRegionLabelStep)
