"""Similarity-MLS policy generator.

Capability parity: vkit/mechanism/distortion_policy/geometric/mls.py:27-111
(corner-pinned control lattice with level-scaled random handle offsets).
"""
from typing import List, Tuple

import attr
from numpy.random import Generator as RandomGenerator

from ....element import Point, PointList
from ....mechanism import distortion
from ..opt import SampleFloatMode, generate_grid_size, sample_float
from ..type import DistortionConfigGenerator, DistortionPolicyFactory


@attr.define
class SimilarityMlsConfigGeneratorConfig:
    num_segments_min: int = 2
    num_segments_max: int = 4
    step_min: int = 10
    radius_max_ratio_min: float = 0.025
    radius_max_ratio_max: float = 0.125
    grid_size_min: int = 15
    grid_size_ratio: float = 0.01


class SimilarityMlsConfigGenerator(
    DistortionConfigGenerator[
        SimilarityMlsConfigGeneratorConfig, distortion.SimilarityMlsConfig
    ]
):

    @classmethod
    def generate_coord(cls, length: int, step: int, rng: RandomGenerator) -> List[int]:
        """Axis coordinates covering [0, length-1] in shuffled ~step jumps."""
        end = length - 1
        if end % step == 0:
            steps = [step] * (end // step)
        else:
            steps = [step] * (end // step - 1)
            steps.append(step + end % step)
        assert sum(steps) == end

        rng.shuffle(steps)
        coord: List[int] = [0]
        for delta in steps:
            coord.append(coord[-1] + delta)
        return coord

    def __call__(self, shape: Tuple[int, int], rng: RandomGenerator):
        short_side_length = min(shape)
        num_segments = int(
            rng.integers(self.config.num_segments_min, self.config.num_segments_max + 1)
        )
        step = (short_side_length - 1) // num_segments
        if step < self.config.step_min:
            # Too tight: degrade to corners only.
            step = short_side_length - 1

        height, width = shape
        coord_y = self.generate_coord(height, step, rng)
        coord_x = self.generate_coord(width, step, rng)
        src_handle_points = PointList()
        for y in coord_y:
            for x in coord_x:
                src_handle_points.append(Point.create(y=y, x=x))

        assert self.config.radius_max_ratio_max < 0.5
        radius_max_ratio = sample_float(
            level=self.level,
            value_min=self.config.radius_max_ratio_min,
            value_max=self.config.radius_max_ratio_max,
            prob_reciprocal=None,
            rng=rng,
            mode=SampleFloatMode.QUAD,
        )
        radius = int(radius_max_ratio * step)
        dst_handle_points = PointList()
        for point in src_handle_points:
            delta_y = int(rng.integers(-radius, radius + 1))
            delta_x = int(rng.integers(-radius, radius + 1))
            dst_handle_points.append(
                Point.create(y=point.y + delta_y, x=point.x + delta_x)
            )

        grid_size = generate_grid_size(
            self.config.grid_size_min, self.config.grid_size_ratio, shape
        )
        return distortion.SimilarityMlsConfig(
            src_handle_points=src_handle_points.to_point_tuple(),
            dst_handle_points=dst_handle_points.to_point_tuple(),
            grid_size=grid_size,
        )


similarity_mls_policy_factory = DistortionPolicyFactory(
    distortion.similarity_mls, SimilarityMlsConfigGenerator
)
