"""Grid creation: uniform src lattice + projected dst lattice.

Capability parity: vkit/mechanism/distortion/geometric/grid_rendering/
grid_creator.py:22-129.
"""
from itertools import chain
from typing import List

from .....element import Point, PointList
from .point_projector import PointProjector
from .type import ImageGrid


def create_src_image_grid(height: int, width: int, grid_size: int) -> ImageGrid:
    ys = list(range(0, height, grid_size))
    if ys[-1] != height - 1:
        ys.append(height - 1)
    xs = list(range(0, width, grid_size))
    if xs[-1] != width - 1:
        xs.append(width - 1)

    points_2d = [
        PointList(Point.create(y=y, x=x) for x in xs) for y in ys
    ]
    return ImageGrid(points_2d=points_2d, grid_size=grid_size)


def create_dst_image_grid_and_shift_amounts_and_resize_ratios(
    src_image_grid: ImageGrid,
    point_projector: PointProjector,
    resize_as_src: bool = True,
):
    src_flatten_points = src_image_grid.flatten_points
    dst_flatten_points = point_projector.project_points(src_flatten_points)
    assert len(dst_flatten_points) == len(src_flatten_points)

    num_cols = src_image_grid.num_cols
    dst_points_2d: List[PointList] = [
        PointList(dst_flatten_points[begin:begin + num_cols])
        for begin in range(0, len(dst_flatten_points), num_cols)
    ]

    # Shift to origin based on the rounded point coordinates.
    all_points = list(chain.from_iterable(dst_points_2d))
    shift_amount_y = min(point.y for point in all_points)
    shift_amount_x = min(point.x for point in all_points)

    dst_points_2d = [
        PointList(
            point.to_shifted_point(offset_y=-shift_amount_y, offset_x=-shift_amount_x)
            for point in row
        ) for row in dst_points_2d
    ]

    resize_ratio_y = 1.0
    resize_ratio_x = 1.0
    if resize_as_src:
        raw_dst_image_grid = ImageGrid(points_2d=dst_points_2d)
        src_image_height = src_image_grid.image_height
        src_image_width = src_image_grid.image_width
        raw_shape = raw_dst_image_grid.image_shape
        resize_ratio_y = src_image_height / raw_shape[0]
        resize_ratio_x = src_image_width / raw_shape[1]

        dst_points_2d = [
            PointList(
                point.to_conducted_resized_point(
                    raw_shape,
                    resized_height=src_image_height,
                    resized_width=src_image_width,
                ) for point in row
            ) for row in dst_points_2d
        ]

    dst_image_grid = ImageGrid(points_2d=dst_points_2d)
    if resize_as_src:
        assert dst_image_grid.image_shape == src_image_grid.image_shape

    return (
        dst_image_grid,
        (shift_amount_y, shift_amount_x),
        (resize_ratio_y, resize_ratio_x),
    )


def create_dst_image_grid(
    src_image_grid: ImageGrid,
    point_projector: PointProjector,
    resize_as_src: bool = True,
) -> ImageGrid:
    dst_image_grid, _, _ = create_dst_image_grid_and_shift_amounts_and_resize_ratios(
        src_image_grid=src_image_grid,
        point_projector=point_projector,
        resize_as_src=resize_as_src,
    )
    return dst_image_grid
