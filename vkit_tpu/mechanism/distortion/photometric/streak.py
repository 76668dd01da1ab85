"""Streak-family photometric distortions (3): line / rectangle / ellipse.

Capability parity: vkit/mechanism/distortion/photometric/streak.py:24-337.
cv.ellipse stroking is replaced by an implicit-equation ring rasterizer.
"""
from typing import List, Optional, Tuple

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ....element import Box, Image, Mask
from ..interface import Distortion, DistortionConfig, DistortionNopState


def fill_vert_dash_gap(dash_thickness: int, dash_gap: int, mask: Mask):
    if dash_thickness <= 0 or dash_gap <= 0:
        return
    with mask.writable_context:
        step = dash_thickness + dash_gap
        for offset_y in range(dash_gap):
            mask.mat[offset_y::step] = 0


def fill_hori_dash_gap(dash_thickness: int, dash_gap: int, mask: Mask):
    if dash_thickness <= 0 or dash_gap <= 0:
        return
    with mask.writable_context:
        step = dash_thickness + dash_gap
        for offset_x in range(dash_gap):
            mask.mat[:, offset_x::step] = 0


@attr.define
class LineStreakConfig(DistortionConfig):
    thickness: int = 1
    gap: int = 4
    dash_thickness: int = 0
    dash_gap: int = 0
    color: Tuple[int, int, int] = (0, 0, 0)
    alpha: float = 1.0
    enable_vert: bool = True
    enable_hori: bool = True


def line_streak_image(config: LineStreakConfig, state, image: Image,
                      rng: Optional[RandomGenerator]) -> Image:
    masks: List[Mask] = []
    step = config.thickness + config.gap

    if config.enable_vert:
        mask = Mask.from_shapable(image)
        with mask.writable_context:
            for offset_x in range(config.thickness):
                mask.mat[:, offset_x::step] = 1
        fill_vert_dash_gap(config.dash_thickness, config.dash_gap, mask)
        masks.append(mask)

    if config.enable_hori:
        mask = Mask.from_shapable(image)
        with mask.writable_context:
            for offset_y in range(config.thickness):
                mask.mat[offset_y::step] = 1
        fill_hori_dash_gap(config.dash_thickness, config.dash_gap, mask)
        masks.append(mask)

    image = image.copy()
    for mask in masks:
        mask.fill_image(image, config.color, alpha=config.alpha)
    return image


line_streak = Distortion(
    config_cls=LineStreakConfig,
    state_cls=DistortionNopState[LineStreakConfig],
    func_image=line_streak_image,
)


def generate_centered_boxes(
    height: int,
    width: int,
    aspect_ratio: float,
    short_side_min: int,
    short_side_step: int,
) -> List[Box]:
    """Concentric boxes growing by short_side_step until both sides leave the
    canvas (streak.py:109-141)."""
    center_y = height // 2
    center_x = width // 2

    boxes: List[Box] = []
    idx = 0
    while True:
        short_side = short_side_min + idx * short_side_step
        if aspect_ratio >= 1:
            height_min = short_side
            width_min = round(height_min * aspect_ratio)
        elif 0 < aspect_ratio < 1:
            width_min = short_side
            height_min = round(width_min / aspect_ratio)
        else:
            raise NotImplementedError()

        up = center_y - height_min // 2
        down = up + height_min - 1
        left = center_x - width_min // 2
        right = left + width_min - 1

        if (0 <= up and down < height) or (0 <= left and right < width):
            boxes.append(Box(up=up, down=down, left=left, right=right))
            idx += 1
        else:
            break
    return boxes


@attr.define
class RectangleStreakConfig(DistortionConfig):
    thickness: int = 1
    aspect_ratio: Optional[float] = None
    dash_thickness: int = 0
    dash_gap: int = 0
    short_side_min: int = 10
    short_side_step: int = 10
    color: Tuple[int, int, int] = (0, 0, 0)
    alpha: float = 1.0


def rectangle_streak_image(config: RectangleStreakConfig, state, image: Image,
                           rng: Optional[RandomGenerator]) -> Image:
    aspect_ratio = config.aspect_ratio
    if aspect_ratio is None:
        aspect_ratio = image.width / image.height

    boxes = generate_centered_boxes(
        height=image.height,
        width=image.width,
        aspect_ratio=aspect_ratio,
        short_side_min=config.short_side_min,
        short_side_step=config.short_side_step,
    )

    # Frame each box with four bars of the configured thickness, clipped to
    # the canvas (streak.py:168-250).
    vert_bars: List[Box] = []
    hori_bars: List[Box] = []
    for box in boxes:
        inner_up = box.down - config.thickness + 1
        inner_down = box.up + config.thickness - 1
        inner_left = box.right - config.thickness + 1
        inner_right = box.left + config.thickness - 1

        bar_up = max(0, box.up)
        bar_down = min(image.height - 1, box.down)

        # Left / right bars.
        if 0 <= inner_right < image.width and bar_up <= bar_down:
            vert_bars.append(
                Box(up=bar_up, down=bar_down, left=max(0, box.left), right=inner_right)
            )
        if 0 <= inner_left < image.width and bar_up <= bar_down:
            vert_bars.append(
                Box(
                    up=bar_up, down=bar_down, left=inner_left,
                    right=min(image.width - 1, box.right),
                )
            )

        bar_left = max(0, inner_right + 1)
        bar_right = min(image.width - 1, inner_left - 1)

        # Top / bottom bars.
        if 0 <= inner_down < image.height and bar_left <= bar_right:
            hori_bars.append(
                Box(up=max(0, box.up), down=inner_down, left=bar_left, right=bar_right)
            )
        if 0 <= inner_up < image.height and bar_left <= bar_right:
            hori_bars.append(
                Box(
                    up=inner_up, down=min(image.height - 1, box.down),
                    left=bar_left, right=bar_right,
                )
            )

    mask_vert = Mask.from_shapable(image)
    with mask_vert.writable_context:
        for bar in vert_bars:
            mask_vert.mat[bar.up:bar.down + 1, bar.left:bar.right + 1] = 1
    fill_vert_dash_gap(config.dash_thickness, config.dash_gap, mask_vert)

    mask_hori = Mask.from_shapable(image)
    with mask_hori.writable_context:
        for bar in hori_bars:
            mask_hori.mat[bar.up:bar.down + 1, bar.left:bar.right + 1] = 1
    fill_hori_dash_gap(config.dash_thickness, config.dash_gap, mask_hori)

    image = image.copy()
    mask_vert.fill_image(image, config.color, alpha=config.alpha)
    mask_hori.fill_image(image, config.color, alpha=config.alpha)
    return image


rectangle_streak = Distortion(
    config_cls=RectangleStreakConfig,
    state_cls=DistortionNopState[RectangleStreakConfig],
    func_image=rectangle_streak_image,
)


def draw_ellipse_ring(
    np_mask: np.ndarray,
    center_xy: Tuple[int, int],
    axes: Tuple[int, int],
    thickness: int,
):
    """Rasterize a stroked ellipse outline via its implicit equation.

    First-party replacement for cv.ellipse(..., thickness) at
    streak.py:305-317: a pixel is on the ring iff it lies between the
    ellipses with semi-axes ± thickness/2.
    """
    height, width = np_mask.shape
    cx, cy = center_xy
    a, b = axes
    if a <= 0 or b <= 0:
        return
    half = max(thickness / 2.0, 0.5)
    ys = np.arange(height, dtype=np.float64)[:, None] - cy
    xs = np.arange(width, dtype=np.float64)[None, :] - cx
    a_out = a + half
    b_out = b + half
    a_in = max(a - half, 0.0)
    b_in = max(b - half, 0.0)
    outer = (xs / a_out)**2 + (ys / b_out)**2 <= 1.0
    if a_in > 0 and b_in > 0:
        inner = (xs / a_in)**2 + (ys / b_in)**2 < 1.0
    else:
        inner = np.zeros_like(outer)
    np_mask[outer & ~inner] = 1


@attr.define
class EllipseStreakConfig(DistortionConfig):
    thickness: int = 1
    aspect_ratio: Optional[float] = None
    short_side_min: int = 10
    short_side_step: int = 10
    color: Tuple[int, int, int] = (0, 0, 0)
    alpha: float = 1.0


def ellipse_streak_image(config: EllipseStreakConfig, state, image: Image,
                         rng: Optional[RandomGenerator]) -> Image:
    aspect_ratio = config.aspect_ratio
    if aspect_ratio is None:
        aspect_ratio = image.width / image.height

    boxes = generate_centered_boxes(
        height=image.height,
        width=image.width,
        aspect_ratio=aspect_ratio,
        short_side_min=config.short_side_min,
        short_side_step=config.short_side_step,
    )

    mask = Mask.from_shapable(image)
    center = (image.width // 2, image.height // 2)
    with mask.writable_context:
        for box in boxes:
            draw_ellipse_ring(
                mask.mat,
                center_xy=center,
                axes=(box.width // 2, box.height // 2),
                thickness=config.thickness,
            )

    image = image.copy()
    mask.fill_image(image, config.color, alpha=config.alpha)
    return image


ellipse_streak = Distortion(
    config_cls=EllipseStreakConfig,
    state_cls=DistortionNopState[EllipseStreakConfig],
    func_image=ellipse_streak_image,
)
