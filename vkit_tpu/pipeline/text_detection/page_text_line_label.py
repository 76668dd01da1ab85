"""Text line label step: char/text-line polygons, height points, boundary
masks/score maps.

Capability parity: vkit/pipeline/text_detection/page_text_line_label.py:25-360.
"""
from typing import List, Optional, Sequence

import attr
from numpy.random import Generator as RandomGenerator

from ...element import Box, Mask, Point, PointList, Polygon, ScoreMap
from ..interface import PipelineStep, PipelineStepFactory
from .page_text_line import PageTextLineCollection, PageTextLineStepOutput


@attr.define
class PageTextLineLabelStepConfig:
    num_sample_height_points: int = 3
    enable_text_line_mask: bool = False
    enable_boundary_mask: bool = False
    boundary_dilate_ratio: float = 0.5
    enable_boundary_score_map: bool = False
    adjusted_ref_char_height_ratio: float = 0.6
    adjusted_ref_char_width_ratio: float = 0.6


@attr.define
class PageTextLineLabelStepInput:
    page_text_line_step_output: PageTextLineStepOutput


@attr.define
class PageTextLinePolygonCollection:
    height: int
    width: int
    polygons: Sequence[Polygon]
    height_points_group_sizes: Sequence[int]
    height_points_up: PointList
    height_points_down: PointList


@attr.define
class PageCharPolygonCollection:
    height: int
    width: int
    char_polygons: Sequence[Polygon]
    adjusted_char_polygons: Sequence[Polygon]
    height_points_up: PointList
    height_points_down: PointList


@attr.define
class PageTextLineLabelStepOutput:
    page_char_polygon_collection: PageCharPolygonCollection
    page_text_line_polygon_collection: PageTextLinePolygonCollection
    page_text_line_mask: Optional[Mask]
    page_text_line_boundary_mask: Optional[Mask]
    page_text_line_and_boundary_mask: Optional[Mask]
    page_text_line_boundary_score_map: Optional[ScoreMap]


class PageTextLineLabelStep(
    PipelineStep[
        PageTextLineLabelStepConfig,
        PageTextLineLabelStepInput,
        PageTextLineLabelStepOutput,
    ]
):

    def generate_page_char_polygon_collection(
        self,
        page_text_line_collection: PageTextLineCollection,
    ) -> PageCharPolygonCollection:
        char_polygons: List[Polygon] = []
        adjusted_char_polygons: List[Polygon] = []
        height_points_up = PointList()
        height_points_down = PointList()

        for text_line in page_text_line_collection.text_lines:
            char_polygons.extend(
                text_line.to_char_polygons(
                    page_height=page_text_line_collection.height,
                    page_width=page_text_line_collection.width,
                )
            )
            adjusted_char_polygons.extend(
                text_line.to_char_polygons(
                    page_height=page_text_line_collection.height,
                    page_width=page_text_line_collection.width,
                    ref_char_height_ratio=self.config.adjusted_ref_char_height_ratio,
                    ref_char_width_ratio=self.config.adjusted_ref_char_width_ratio,
                )
            )
            height_points_up.extend(text_line.get_char_level_height_points(is_up=True))
            height_points_down.extend(
                text_line.get_char_level_height_points(is_up=False)
            )

        assert len(char_polygons) == len(adjusted_char_polygons) \
            == len(height_points_up) == len(height_points_down)

        return PageCharPolygonCollection(
            height=page_text_line_collection.height,
            width=page_text_line_collection.width,
            char_polygons=char_polygons,
            adjusted_char_polygons=adjusted_char_polygons,
            height_points_up=height_points_up,
            height_points_down=height_points_down,
        )

    def generate_page_text_line_polygon_collection(
        self,
        page_text_line_collection: PageTextLineCollection,
    ) -> PageTextLinePolygonCollection:
        text_line_polygons: List[Polygon] = []
        height_points_group_sizes: List[int] = []
        height_points_up = PointList()
        height_points_down = PointList()

        for text_line in page_text_line_collection.text_lines:
            text_line_polygons.append(text_line.to_polygon())

            cur_up = text_line.get_height_points(
                num_points=self.config.num_sample_height_points, is_up=True
            )
            cur_down = text_line.get_height_points(
                num_points=self.config.num_sample_height_points, is_up=False
            )
            group_size = len(cur_up)
            assert group_size == len(cur_down) and group_size > 0
            height_points_group_sizes.append(group_size)
            height_points_up.extend(cur_up)
            height_points_down.extend(cur_down)

        return PageTextLinePolygonCollection(
            height=page_text_line_collection.height,
            width=page_text_line_collection.width,
            polygons=text_line_polygons,
            height_points_group_sizes=height_points_group_sizes,
            height_points_up=height_points_up,
            height_points_down=height_points_down,
        )

    def generate_page_text_line_mask(
        self,
        page_text_line_collection: PageTextLineCollection,
    ) -> Mask:
        page_text_line_mask = Mask.from_shape(page_text_line_collection.shape)
        for text_line in page_text_line_collection.text_lines:
            text_line.box.fill_mask(page_text_line_mask)
        return page_text_line_mask

    def generate_text_line_boxes_and_dilated_boxes(
        self,
        page_text_line_collection: PageTextLineCollection,
    ):
        text_lines = sorted(
            page_text_line_collection.text_lines,
            key=lambda tl: tl.font_size,
            reverse=True,
        )
        boxes: List[Box] = []
        dilated_boxes: List[Box] = []
        for text_line in text_lines:
            box = text_line.box
            boxes.append(box)
            dilated_box = box.to_dilated_box(
                self.config.boundary_dilate_ratio, clip_long_side=True
            )
            dilated_boxes.append(
                dilated_box.to_clipped_box(page_text_line_collection.shape)
            )
        return boxes, dilated_boxes

    @classmethod
    def generate_dilated_only_boxes(cls, box: Box, dilated_box: Box):
        dilated_up_box = dilated_box._replace(down=box.up - 1)
        if dilated_up_box.up > dilated_up_box.down:
            dilated_up_box = None

        dilated_down_box = dilated_box._replace(up=box.down + 1)
        if dilated_down_box.up > dilated_down_box.down:
            dilated_down_box = None

        dilated_left_box = box._replace(left=dilated_box.left, right=box.left - 1)
        if dilated_left_box.left > dilated_left_box.right:
            dilated_left_box = None

        dilated_right_box = box._replace(left=box.right + 1, right=dilated_box.right)
        if dilated_right_box.left > dilated_right_box.right:
            dilated_right_box = None

        return dilated_up_box, dilated_down_box, dilated_left_box, dilated_right_box

    def generate_page_text_line_boundary_masks(
        self,
        page_text_line_collection: PageTextLineCollection,
        boxes: Sequence[Box],
        dilated_boxes: Sequence[Box],
        page_text_line_mask: Mask,
    ):
        boundary_mask = Mask.from_shape(page_text_line_collection.shape)
        for box, dilated_box in zip(boxes, dilated_boxes):
            for dilated_only_box in self.generate_dilated_only_boxes(box, dilated_box):
                if dilated_only_box:
                    dilated_only_box.fill_mask(boundary_mask)

        page_text_line_mask.fill_mask(boundary_mask, 0)

        text_line_and_boundary_mask = boundary_mask.copy()
        page_text_line_mask.fill_mask(text_line_and_boundary_mask)
        return boundary_mask, text_line_and_boundary_mask

    def generate_page_text_line_boundary_score_map(
        self,
        page_text_line_collection: PageTextLineCollection,
        boxes: Sequence[Box],
        dilated_boxes: Sequence[Box],
        page_text_line_boundary_mask: Mask,
    ) -> ScoreMap:
        boundary_score_map = ScoreMap.from_shape(
            page_text_line_collection.shape, value=1.0
        )

        for box, dilated_box in zip(boxes, dilated_boxes):
            (
                dilated_up_box,
                dilated_down_box,
                dilated_left_box,
                dilated_right_box,
            ) = self.generate_dilated_only_boxes(box, dilated_box)

            # v runs 0 at the text line edge to 1 at the dilated edge.
            if dilated_up_box:
                boundary_score_map.fill_by_quad_interpolation(
                    point0=Point.create(y=box.up, x=box.right),
                    point1=Point.create(y=box.up, x=box.left),
                    point2=Point.create(y=dilated_box.up, x=dilated_box.left),
                    point3=Point.create(y=dilated_box.up, x=dilated_box.right),
                    func_np_uv_to_mat=lambda np_uv: np_uv[:, :, 1],
                    keep_min_value=True,
                )
            if dilated_down_box:
                boundary_score_map.fill_by_quad_interpolation(
                    point0=Point.create(y=box.down, x=box.left),
                    point1=Point.create(y=box.down, x=box.right),
                    point2=Point.create(y=dilated_box.down, x=dilated_box.right),
                    point3=Point.create(y=dilated_box.down, x=dilated_box.left),
                    func_np_uv_to_mat=lambda np_uv: np_uv[:, :, 1],
                    keep_min_value=True,
                )
            if dilated_left_box:
                boundary_score_map.fill_by_quad_interpolation(
                    point0=Point.create(y=box.up, x=box.left),
                    point1=Point.create(y=box.down, x=box.left),
                    point2=Point.create(y=dilated_box.down, x=dilated_box.left),
                    point3=Point.create(y=dilated_box.up, x=dilated_box.left),
                    func_np_uv_to_mat=lambda np_uv: np_uv[:, :, 1],
                    keep_min_value=True,
                )
            if dilated_right_box:
                boundary_score_map.fill_by_quad_interpolation(
                    point0=Point.create(y=box.down, x=box.right),
                    point1=Point.create(y=box.up, x=box.right),
                    point2=Point.create(y=dilated_box.up, x=dilated_box.right),
                    point3=Point.create(y=dilated_box.down, x=dilated_box.right),
                    func_np_uv_to_mat=lambda np_uv: np_uv[:, :, 1],
                    keep_min_value=True,
                )

        page_text_line_boundary_mask.to_inverted_mask().fill_score_map(
            boundary_score_map, 0.0
        )
        return boundary_score_map

    def run(self, input: PageTextLineLabelStepInput, rng: RandomGenerator):
        page_text_line_collection = (
            input.page_text_line_step_output.page_text_line_collection
        )

        page_char_polygon_collection = self.generate_page_char_polygon_collection(
            page_text_line_collection
        )
        page_text_line_polygon_collection = (
            self.generate_page_text_line_polygon_collection(page_text_line_collection)
        )

        page_text_line_mask: Optional[Mask] = None
        page_text_line_boundary_mask: Optional[Mask] = None
        page_text_line_and_boundary_mask: Optional[Mask] = None
        page_text_line_boundary_score_map: Optional[ScoreMap] = None

        if self.config.enable_text_line_mask:
            page_text_line_mask = self.generate_page_text_line_mask(
                page_text_line_collection
            )
            boxes, dilated_boxes = self.generate_text_line_boxes_and_dilated_boxes(
                page_text_line_collection
            )
            if self.config.enable_boundary_mask:
                (
                    page_text_line_boundary_mask,
                    page_text_line_and_boundary_mask,
                ) = self.generate_page_text_line_boundary_masks(
                    page_text_line_collection,
                    boxes,
                    dilated_boxes,
                    page_text_line_mask,
                )
                if self.config.enable_boundary_score_map:
                    page_text_line_boundary_score_map = (
                        self.generate_page_text_line_boundary_score_map(
                            page_text_line_collection,
                            boxes,
                            dilated_boxes,
                            page_text_line_boundary_mask,
                        )
                    )

        return PageTextLineLabelStepOutput(
            page_char_polygon_collection=page_char_polygon_collection,
            page_text_line_polygon_collection=page_text_line_polygon_collection,
            page_text_line_mask=page_text_line_mask,
            page_text_line_boundary_mask=page_text_line_boundary_mask,
            page_text_line_and_boundary_mask=page_text_line_and_boundary_mask,
            page_text_line_boundary_score_map=page_text_line_boundary_score_map,
        )


page_text_line_label_step_factory = PipelineStepFactory(PageTextLineLabelStep)
