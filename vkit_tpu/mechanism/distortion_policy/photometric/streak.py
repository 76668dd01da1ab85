"""Streak policy generators (3).

Capability parity: vkit/mechanism/distortion_policy/photometric/streak.py.
"""
from typing import Tuple

import attr
from numpy.random import Generator as RandomGenerator

from ....mechanism import distortion
from ..opt import sample_float
from ..type import DistortionConfigGenerator, DistortionPolicyFactory


@attr.define
class LineStreakConfigGeneratorConfig:
    thickness_min: int = 1
    thickness_max: int = 4
    gap_min: int = 5
    gap_ratio_min: float = 0.01
    gap_ratio_max: float = 0.5
    prob_dash: float = 0.25
    dash_thickness_ratio_min: float = 0.0
    dash_thickness_ratio_max: float = 0.05
    dash_to_thickness_gap_ratio_min: float = 0.5
    dash_to_thickness_gap_ratio_max: float = 1.0
    alpha_min: float = 0.2
    alpha_max: float = 1.0


def _sample_dash(config, long_side_length: int, rng: RandomGenerator):
    dash_thickness = 0
    dash_gap = 0
    if rng.random() < config.prob_dash:
        dash_thickness_ratio = float(
            rng.uniform(config.dash_thickness_ratio_min, config.dash_thickness_ratio_max)
        )
        dash_thickness = round(dash_thickness_ratio * long_side_length)
        dash_to_thickness_gap_ratio = float(
            rng.uniform(
                config.dash_to_thickness_gap_ratio_min,
                config.dash_to_thickness_gap_ratio_max,
            )
        )
        dash_gap = round(dash_to_thickness_gap_ratio * dash_thickness)
    return dash_thickness, dash_gap


class LineStreakConfigGenerator(
    DistortionConfigGenerator[
        LineStreakConfigGeneratorConfig, distortion.LineStreakConfig
    ]
):

    def __call__(self, shape: Tuple[int, int], rng: RandomGenerator):
        long_side_length = max(shape)
        gap_ratio = sample_float(
            level=self.level,
            value_min=self.config.gap_ratio_min,
            value_max=self.config.gap_ratio_max,
            prob_reciprocal=None,
            rng=rng,
            inverse_level=True,
        )
        gap = max(self.config.gap_min, round(gap_ratio * long_side_length))
        thickness = int(
            rng.integers(self.config.thickness_min, self.config.thickness_max + 1)
        )
        dash_thickness, dash_gap = _sample_dash(self.config, long_side_length, rng)
        alpha = rng.uniform(self.config.alpha_min, self.config.alpha_max)

        mode = rng.integers(0, 3)
        enable_vert = mode in (0, 2)
        enable_hori = mode in (1, 2)

        return distortion.LineStreakConfig(
            thickness=thickness,
            gap=gap,
            dash_thickness=dash_thickness,
            dash_gap=dash_gap,
            alpha=alpha,
            enable_vert=enable_vert,
            enable_hori=enable_hori,
        )


line_streak_policy_factory = DistortionPolicyFactory(
    distortion.line_streak, LineStreakConfigGenerator
)


def sample_params_for_rectangle_and_ellipse_streak(
    level: int,
    thickness_min: int,
    thickness_max: int,
    aspect_ratio_min: float,
    aspect_ratio_max: float,
    short_side_min: int,
    short_side_min_ratio_min: float,
    short_side_min_ratio_max: float,
    short_side_step_ratio_min: float,
    short_side_step_ratio_max: float,
    alpha_min: float,
    alpha_max: float,
    shape: Tuple[int, int],
    rng: RandomGenerator,
):
    long_side_length = max(shape)
    short_side_min_ratio = sample_float(
        level=level,
        value_min=short_side_min_ratio_min,
        value_max=short_side_min_ratio_max,
        prob_reciprocal=None,
        rng=rng,
        inverse_level=True,
    )
    short_side_min = max(short_side_min, round(short_side_min_ratio * long_side_length))
    short_side_step_ratio = rng.uniform(
        short_side_step_ratio_min, short_side_step_ratio_max
    )
    short_side_step = round(short_side_step_ratio * short_side_min)
    thickness = int(rng.integers(thickness_min, thickness_max + 1))
    aspect_ratio = rng.uniform(aspect_ratio_min, aspect_ratio_max)
    alpha = rng.uniform(alpha_min, alpha_max)
    return thickness, aspect_ratio, short_side_min, short_side_step, alpha


@attr.define
class RectangleStreakConfigGeneratorConfig:
    thickness_min: int = 1
    thickness_max: int = 4
    aspect_ratio_min: float = 0.5
    aspect_ratio_max: float = 1.5
    prob_dash: float = 0.25
    dash_thickness_ratio_min: float = 0.0
    dash_thickness_ratio_max: float = 0.05
    dash_to_thickness_gap_ratio_min: float = 0.5
    dash_to_thickness_gap_ratio_max: float = 1.0
    short_side_min: int = 5
    short_side_min_ratio_min: float = 0.01
    short_side_min_ratio_max: float = 0.25
    short_side_step_ratio_min: float = 0.8
    short_side_step_ratio_max: float = 3.0
    alpha_min: float = 0.2
    alpha_max: float = 1.0


class RectangleStreakConfigGenerator(
    DistortionConfigGenerator[
        RectangleStreakConfigGeneratorConfig, distortion.RectangleStreakConfig
    ]
):

    def __call__(self, shape: Tuple[int, int], rng: RandomGenerator):
        (
            thickness, aspect_ratio, short_side_min, short_side_step, alpha,
        ) = sample_params_for_rectangle_and_ellipse_streak(
            level=self.level,
            thickness_min=self.config.thickness_min,
            thickness_max=self.config.thickness_max,
            aspect_ratio_min=self.config.aspect_ratio_min,
            aspect_ratio_max=self.config.aspect_ratio_max,
            short_side_min=self.config.short_side_min,
            short_side_min_ratio_min=self.config.short_side_min_ratio_min,
            short_side_min_ratio_max=self.config.short_side_min_ratio_max,
            short_side_step_ratio_min=self.config.short_side_step_ratio_min,
            short_side_step_ratio_max=self.config.short_side_step_ratio_max,
            alpha_min=self.config.alpha_min,
            alpha_max=self.config.alpha_max,
            shape=shape,
            rng=rng,
        )
        long_side_length = max(shape)
        dash_thickness, dash_gap = _sample_dash(self.config, long_side_length, rng)
        return distortion.RectangleStreakConfig(
            thickness=thickness,
            aspect_ratio=aspect_ratio,
            dash_thickness=dash_thickness,
            dash_gap=dash_gap,
            short_side_min=short_side_min,
            short_side_step=short_side_step,
            alpha=alpha,
        )


rectangle_streak_policy_factory = DistortionPolicyFactory(
    distortion.rectangle_streak, RectangleStreakConfigGenerator
)


@attr.define
class EllipseStreakConfigGeneratorConfig:
    thickness_min: int = 1
    thickness_max: int = 3
    aspect_ratio_min: float = 0.5
    aspect_ratio_max: float = 1.5
    short_side_min: int = 5
    short_side_min_ratio_min: float = 0.01
    short_side_min_ratio_max: float = 0.25
    short_side_step_ratio_min: float = 0.8
    short_side_step_ratio_max: float = 3.0
    alpha_min: float = 0.2
    alpha_max: float = 1.0


class EllipseStreakConfigGenerator(
    DistortionConfigGenerator[
        EllipseStreakConfigGeneratorConfig, distortion.EllipseStreakConfig
    ]
):

    def __call__(self, shape: Tuple[int, int], rng: RandomGenerator):
        (
            thickness, aspect_ratio, short_side_min, short_side_step, alpha,
        ) = sample_params_for_rectangle_and_ellipse_streak(
            level=self.level,
            thickness_min=self.config.thickness_min,
            thickness_max=self.config.thickness_max,
            aspect_ratio_min=self.config.aspect_ratio_min,
            aspect_ratio_max=self.config.aspect_ratio_max,
            short_side_min=self.config.short_side_min,
            short_side_min_ratio_min=self.config.short_side_min_ratio_min,
            short_side_min_ratio_max=self.config.short_side_min_ratio_max,
            short_side_step_ratio_min=self.config.short_side_step_ratio_min,
            short_side_step_ratio_max=self.config.short_side_step_ratio_max,
            alpha_min=self.config.alpha_min,
            alpha_max=self.config.alpha_max,
            shape=shape,
            rng=rng,
        )
        return distortion.EllipseStreakConfig(
            thickness=thickness,
            aspect_ratio=aspect_ratio,
            short_side_min=short_side_min,
            short_side_step=short_side_step,
            alpha=alpha,
        )


ellipse_streak_policy_factory = DistortionPolicyFactory(
    distortion.ellipse_streak, EllipseStreakConfigGenerator
)
