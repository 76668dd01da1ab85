"""Debug rendering of an ImageGrid.

Capability parity: vkit/mechanism/distortion/geometric/grid_rendering/
visualization.py:21-58 (PIL line drawing).
"""
from PIL import Image as PilImage
from PIL import ImageDraw

from .....element import Image
from .type import ImageGrid


def visualize_image_grid(
    image_grid: ImageGrid,
    line_color: str = 'black',
    background_color: str = 'white',
    line_width: int = 1,
) -> Image:
    pil_image = PilImage.new(
        'RGB',
        (image_grid.image_width, image_grid.image_height),
        background_color,
    )
    draw = ImageDraw.Draw(pil_image)

    for row in range(image_grid.num_rows):
        for col in range(image_grid.num_cols):
            point = image_grid.points_2d[row][col]
            if col + 1 < image_grid.num_cols:
                right = image_grid.points_2d[row][col + 1]
                draw.line((point.x, point.y, right.x, right.y),
                          fill=line_color, width=line_width)
            if row + 1 < image_grid.num_rows:
                down = image_grid.points_2d[row + 1][col]
                draw.line((point.x, point.y, down.x, down.y),
                          fill=line_color, width=line_width)

    return Image.from_pil_image(pil_image)
