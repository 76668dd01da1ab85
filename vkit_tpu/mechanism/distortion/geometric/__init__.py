from .affine import (
    ShearHoriConfig,
    ShearVertConfig,
    RotateConfig,
    SkewHoriConfig,
    SkewVertConfig,
    shear_hori,
    shear_vert,
    rotate,
    skew_hori,
    skew_vert,
)
from .camera import (
    CameraModel,
    CameraModelConfig,
    CameraPlaneOnlyConfig,
    CameraCubicCurveConfig,
    CameraPlaneLineFoldConfig,
    CameraPlaneLineCurveConfig,
    camera_plane_only,
    camera_cubic_curve,
    camera_plane_line_fold,
    camera_plane_line_curve,
)
from .mls import SimilarityMlsConfig, similarity_mls
from . import grid_rendering
