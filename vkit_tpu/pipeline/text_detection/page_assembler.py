"""Page assembler: composite every layer into the final page.

Capability parity: vkit/pipeline/text_detection/page_assembler.py:45-277.
"""
from typing import List, Sequence

import attr
from numpy.random import Generator as RandomGenerator

from ...element import Box, Image, Polygon, Shapable
from ...engine.seal_impression import fill_text_line_to_seal_impression
from ...mechanism.distortion import rotate
from ..interface import PipelineStep, PipelineStepFactory
from .page_background import PageBackgroundStepOutput
from .page_barcode import PageBarcodeStepOutput
from .page_image import PageImageCollection, PageImageStepOutput
from .page_layout import DisconnectedTextRegion, NonTextRegion, PageLayoutStepOutput
from .page_non_text_symbol import PageNonTextSymbolStepOutput
from .page_text_line import (
    PageSealImpressionTextLineCollection,
    PageTextLineCollection,
    PageTextLineStepOutput,
)
from .page_text_line_bounding_box import PageTextLineBoundingBoxStepOutput
from .page_text_line_label import (
    PageCharPolygonCollection,
    PageTextLineLabelStepOutput,
    PageTextLinePolygonCollection,
)


@attr.define
class PageAssemblerStepConfig:
    pass


@attr.define
class PageAssemblerStepInput:
    page_layout_step_output: PageLayoutStepOutput
    page_background_step_output: PageBackgroundStepOutput
    page_image_step_output: PageImageStepOutput
    page_barcode_step_output: PageBarcodeStepOutput
    page_text_line_step_output: PageTextLineStepOutput
    page_non_text_symbol_step_output: PageNonTextSymbolStepOutput
    page_text_line_bounding_box_step_output: PageTextLineBoundingBoxStepOutput
    page_text_line_label_step_output: PageTextLineLabelStepOutput


@attr.define
class PageDisconnectedTextRegionCollection:
    disconnected_text_regions: Sequence[DisconnectedTextRegion]

    def to_polygons(self):
        for disconnected_text_region in self.disconnected_text_regions:
            yield disconnected_text_region.polygon


@attr.define
class PageNonTextRegionCollection:
    non_text_regions: Sequence[NonTextRegion]

    def to_polygons(self):
        for non_text_region in self.non_text_regions:
            yield non_text_region.polygon


@attr.define
class PageSealImpressionCharPolygonCollection:
    char_polygons: Sequence[Polygon]


@attr.define
class Page(Shapable):
    image: Image
    page_image_collection: PageImageCollection
    page_bottom_layer_image: Image
    page_text_line_collection: PageTextLineCollection
    page_seal_impression_text_line_collection: PageSealImpressionTextLineCollection
    page_char_polygon_collection: PageCharPolygonCollection
    page_text_line_polygon_collection: PageTextLinePolygonCollection
    page_disconnected_text_region_collection: PageDisconnectedTextRegionCollection
    page_non_text_region_collection: PageNonTextRegionCollection
    page_seal_impression_char_polygon_collection: PageSealImpressionCharPolygonCollection

    @property
    def height(self) -> int:
        return self.image.height

    @property
    def width(self) -> int:
        return self.image.width


@attr.define
class PageAssemblerStepOutput:
    page: Page


class PageAssemblerStep(
    PipelineStep[PageAssemblerStepConfig, PageAssemblerStepInput, PageAssemblerStepOutput]
):

    def run(self, input: PageAssemblerStepInput, rng: RandomGenerator):
        page_layout = input.page_layout_step_output.page_layout
        background_image = input.page_background_step_output.background_image
        page_image_collection = input.page_image_step_output.page_image_collection
        page_bottom_layer_image = input.page_image_step_output.page_bottom_layer_image
        page_barcode_step_output = input.page_barcode_step_output
        page_text_line_collection = (
            input.page_text_line_step_output.page_text_line_collection
        )
        page_seal_impression_text_line_collection = (
            input.page_text_line_step_output.page_seal_impression_text_line_collection
        )
        page_non_text_symbol_step_output = input.page_non_text_symbol_step_output
        text_line_bounding_box_score_maps = (
            input.page_text_line_bounding_box_step_output.score_maps
        )
        text_line_bounding_box_colors = (
            input.page_text_line_bounding_box_step_output.colors
        )
        page_char_polygon_collection = (
            input.page_text_line_label_step_output.page_char_polygon_collection
        )
        page_text_line_polygon_collection = (
            input.page_text_line_label_step_output.page_text_line_polygon_collection
        )

        # Background.
        assert background_image.mat.shape == (page_layout.height, page_layout.width, 3)
        assembled_image = background_image.copy()

        # Photos.
        for page_image in page_image_collection.page_images:
            page_image.box.fill_image(
                assembled_image, page_image.image, alpha=page_image.alpha
            )

        # Barcodes (score map as alpha, black ink).
        for barcode_qr_score_map in page_barcode_step_output.barcode_qr_score_maps:
            assembled_image[barcode_qr_score_map] = (0, 0, 0)
        for barcode_code39_score_map in page_barcode_step_output.barcode_code39_score_maps:
            assembled_image[barcode_code39_score_map] = (0, 0, 0)

        # Decorative text line bounding boxes.
        for score_map, color in zip(
            text_line_bounding_box_score_maps, text_line_bounding_box_colors
        ):
            assembled_image[score_map] = color

        # Text lines.
        for text_line in page_text_line_collection.text_lines:
            if text_line.score_map:
                text_line.score_map.fill_image(assembled_image, text_line.glyph_color)
            else:
                text_line.mask.fill_image(assembled_image, text_line.image)

        # Non-text symbols.
        for image, box, alpha in zip(
            page_non_text_symbol_step_output.images,
            page_non_text_symbol_step_output.boxes,
            page_non_text_symbol_step_output.alphas,
        ):
            box.fill_image(assembled_image, value=image, alpha=alpha)

        # Seal impressions.
        page_seal_impression_char_polygons: List[Polygon] = []
        for seal_impression, seal_impression_resource in zip(
            page_seal_impression_text_line_collection.seal_impressions,
            page_seal_impression_text_line_collection.seal_impression_resources,
        ):
            alpha = seal_impression.alpha
            color = seal_impression.color

            background_mask = seal_impression.background_mask
            text_line_filled_score_map, char_polygons = (
                fill_text_line_to_seal_impression(
                    seal_impression,
                    seal_impression_resource.text_line_slot_indices,
                    seal_impression_resource.text_lines,
                    seal_impression_resource.internal_text_line,
                )
            )

            rotated_result = rotate.distort(
                {'angle': seal_impression_resource.angle},
                mask=background_mask,
                score_map=text_line_filled_score_map,
                polygons=char_polygons,
            )
            background_mask = rotated_result.mask
            text_line_filled_score_map = rotated_result.score_map
            assert background_mask and text_line_filled_score_map
            assert background_mask.shape == text_line_filled_score_map.shape
            assert rotated_result.polygons

            box_center_point = seal_impression_resource.box.get_center_point()
            up = box_center_point.y - background_mask.height // 2
            down = up + background_mask.height - 1
            left = box_center_point.x - background_mask.width // 2
            right = left + background_mask.width - 1

            if up < 0 or down >= assembled_image.height \
                    or left < 0 or right >= assembled_image.width:
                # Out-of-bound after rotation: skip the stamp.
                continue

            box = Box(up=up, down=down, left=left, right=right)
            box.fill_image(
                assembled_image, value=color, image_mask=background_mask, alpha=alpha
            )
            box.fill_image(
                assembled_image, value=color, alpha=text_line_filled_score_map
            )

            page_seal_impression_char_polygons.extend(
                char_polygon.to_shifted_polygon(offset_y=up, offset_x=left)
                for char_polygon in rotated_result.polygons
            )

        page = Page(
            image=assembled_image,
            page_image_collection=page_image_collection,
            page_bottom_layer_image=page_bottom_layer_image,
            page_text_line_collection=page_text_line_collection,
            page_seal_impression_text_line_collection=(
                page_seal_impression_text_line_collection
            ),
            page_char_polygon_collection=page_char_polygon_collection,
            page_text_line_polygon_collection=page_text_line_polygon_collection,
            page_disconnected_text_region_collection=(
                PageDisconnectedTextRegionCollection(
                    page_layout.disconnected_text_regions
                )
            ),
            page_non_text_region_collection=PageNonTextRegionCollection(
                page_layout.non_text_regions
            ),
            page_seal_impression_char_polygon_collection=(
                PageSealImpressionCharPolygonCollection(
                    char_polygons=page_seal_impression_char_polygons
                )
            ),
        )
        return PageAssemblerStepOutput(page=page)


page_assembler_step_factory = PipelineStepFactory(PageAssemblerStep)
