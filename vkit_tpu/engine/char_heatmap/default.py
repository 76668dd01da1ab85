"""Default char heatmap engine: per-char perspective-warped gaussian.

Capability parity: vkit/engine/char_heatmap/default.py:30-195.  The per-char
cv.warpPerspective goes through the device warp kernel.
"""
from typing import Optional

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ...element import ElementSetOperationMode, Mask, ScoreMap
from ...ops import warp as warp_ops
from ..interface import Engine, EngineExecutorFactory, NoneTypeEngineInitResource
from .type import CharHeatmap, CharHeatmapEngineRunConfig


def build_np_distance(radius: int) -> np.ndarray:
    side_length = radius * 2 + 1
    np_offset = np.abs(np.arange(side_length, dtype=np.float32) - radius)
    return np.sqrt(np_offset[:, None]**2 + np_offset[None, :]**2)


@attr.define
class CharHeatmapDefaultEngineInitConfig:
    # Larger distance factor -> smaller effective std -> tighter activation.
    gaussian_map_distance_factor: float = 2.25
    gaussian_map_char_radius: int = 25
    gaussian_map_preserving_score_min: float = 0.9
    weight_neutralized_score_map: float = 0.4


@attr.define
class CharHeatmapDefaultDebug:
    score_map_max: ScoreMap
    score_map_min: ScoreMap
    char_overlapped_mask: Mask
    char_neutralized_score_map: ScoreMap
    neutralized_mask: Mask
    neutralized_score_map: ScoreMap


class CharHeatmapDefaultEngine(
    Engine[
        CharHeatmapDefaultEngineInitConfig,
        NoneTypeEngineInitResource,
        CharHeatmapEngineRunConfig,
        CharHeatmap,
    ]
):

    @classmethod
    def get_type_name(cls) -> str:
        return 'default'

    def __init__(self, init_config, init_resource=None):
        super().__init__(init_config, init_resource)

        char_radius = self.init_config.gaussian_map_char_radius
        np_distance = build_np_distance(char_radius)
        side_length = np_distance.shape[0]
        np_norm_distance = np_distance / char_radius
        self.np_gaussian_map = np.exp(
            -0.5 * np.square(
                self.init_config.gaussian_map_distance_factor * np_norm_distance
            )
        ).astype(np.float32)

        char_end = side_length - 1
        self.np_char_points = np.asarray(
            [(0, 0), (char_end, 0), (char_end, char_end), (0, char_end)],
            dtype=np.float64,
        )

    def run(self, run_config: CharHeatmapEngineRunConfig,
            rng: Optional[RandomGenerator] = None) -> CharHeatmap:
        height = run_config.height
        width = run_config.width
        char_polygons = run_config.char_polygons
        shape = (height, width)

        score_map_max = ScoreMap.from_shape(shape)
        score_map_min = ScoreMap.from_shape(shape, value=1.0)

        # One batched linear solve for all per-char homographies.
        if char_polygons:
            num_chars = len(char_polygons)
            src_quads = np.broadcast_to(
                self.np_char_points, (num_chars, 4, 2)
            )
            dst_quads = np.stack([
                polygon.internals.np_self_relative_points.astype(np.float64)
                for polygon in char_polygons
            ])
            trans_mats = warp_ops.solve_perspective_batch(src_quads, dst_quads)

            # Per-char warps stay as a small loop: the rasters are tiny and
            # cache-resident; stacked/padded batching measured slower on
            # fault-heavy hosts.
            for char_idx, char_polygon in enumerate(char_polygons):
                char_bounding_box = char_polygon.bounding_box
                np_gaussian_map = warp_ops.warp_perspective_np(
                    self.np_gaussian_map,
                    trans_mats[char_idx],
                    (char_bounding_box.height, char_bounding_box.width),
                )
                np_gaussian_map = np.clip(np_gaussian_map, 0.0, 1.0)
                score_map = ScoreMap(
                    mat=np_gaussian_map.astype(np.float32),
                    box=char_bounding_box,
                )
                char_polygon.fill_score_map(
                    score_map_max, score_map, keep_max_value=True
                )
                char_polygon.fill_score_map(
                    score_map_min, score_map, keep_min_value=True
                )

        char_overlapped_mask = Mask.from_polygons(
            shape, char_polygons, ElementSetOperationMode.INTERSECT
        )

        preserving_score_min = self.init_config.gaussian_map_preserving_score_min
        preserving_mask = Mask(
            mat=(score_map_max.mat >= preserving_score_min).astype(np.uint8)
        )

        neutralized_mask = Mask.from_masks(
            shape,
            [char_overlapped_mask, preserving_mask.to_inverted_mask()],
            ElementSetOperationMode.INTERSECT,
        )

        np_delta = np.clip(score_map_max.mat - score_map_min.mat, 0.0, 1.0)
        char_neutralized_score_map = ScoreMap(mat=np_delta)

        neutralized_score_map = score_map_max.copy()
        neutralized_mask.fill_score_map(neutralized_score_map, char_neutralized_score_map)

        weight = self.init_config.weight_neutralized_score_map
        score_map = ScoreMap(
            mat=(
                (1 - weight) * score_map_max.mat + weight * neutralized_score_map.mat
            ).astype(np.float32)
        )

        debug = None
        if run_config.enable_debug:
            debug = CharHeatmapDefaultDebug(
                score_map_max=score_map_max,
                score_map_min=score_map_min,
                char_overlapped_mask=char_overlapped_mask,
                char_neutralized_score_map=char_neutralized_score_map,
                neutralized_mask=neutralized_mask,
                neutralized_score_map=neutralized_score_map,
            )

        return CharHeatmap(score_map=score_map, debug=debug)


char_heatmap_default_engine_executor_factory = EngineExecutorFactory(
    CharHeatmapDefaultEngine
)
