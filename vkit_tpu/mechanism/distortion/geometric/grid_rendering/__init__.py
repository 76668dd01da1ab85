from .grid_blender import (
    blend_src_to_dst_image,
    blend_src_to_dst_mask,
    blend_src_to_dst_score_map,
    create_image_from_image_grid,
    create_mask_from_image_grid,
    create_score_map_from_image_grid,
)
from .grid_creator import (
    create_dst_image_grid,
    create_dst_image_grid_and_shift_amounts_and_resize_ratios,
    create_src_image_grid,
)
from .interface import (
    DistortionImageGridBased,
    DistortionStateImageGridBased,
    FuncImageGridBased,
)
from .point_projector import PointProjector
from .type import ImageGrid
from .visualization import visualize_image_grid
