"""Camera-model geometric distortions (4): plane_only, cubic_curve,
plane_line_fold, plane_line_curve.

Capability parity: vkit/mechanism/distortion/geometric/camera.py:58-575.
cv.Rodrigues / cv.projectPoints are replaced by closed-form numpy
(axis-angle rotation + pinhole projection); each strategy lifts the 2-D grid
into 3-D, the camera projects it back, and the grid-rendering machinery turns
the projected lattice into a dense backward map for the device warp kernel.
"""
import math
from typing import Callable, Optional, Sequence, Tuple, TypeVar, Union

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ....element import Point, PointList, PointTuple
from ..interface import DistortionConfig
from .grid_rendering.grid_creator import create_src_image_grid
from .grid_rendering.interface import (
    DistortionImageGridBased,
    DistortionStateImageGridBased,
)
from .grid_rendering.point_projector import PointProjector

_T_CONFIG = TypeVar('_T_CONFIG', bound=DistortionConfig)


def rodrigues(rotation_vec: np.ndarray) -> np.ndarray:
    """Axis-angle -> rotation matrix (cv.Rodrigues equivalent)."""
    rotation_vec = np.asarray(rotation_vec, dtype=np.float64).reshape(3)
    theta = float(np.linalg.norm(rotation_vec))
    if theta < 1e-12:
        return np.eye(3)
    axis = rotation_vec / theta
    x, y, z = axis
    skew = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return (
        math.cos(theta) * np.eye(3)
        + (1 - math.cos(theta)) * np.outer(axis, axis)
        + math.sin(theta) * skew
    )


class Point2dTo3dStrategy:

    def generate_np_3d_points(self, points: PointTuple) -> np.ndarray:
        raise NotImplementedError()


@attr.define
class CameraModelConfig:
    rotation_unit_vec: Sequence[float]
    rotation_theta: float
    focal_length: Optional[float] = None
    principal_point: Optional[Sequence[float]] = None
    camera_distance: Optional[float] = None


class CameraModel:
    """Pinhole camera: extrinsics derived so the principal point (given in
    world coordinates on the image plane) lands on the optical axis at
    ``camera_distance`` (camera.py:58-196)."""

    def __init__(self, config: CameraModelConfig):
        assert config.focal_length and config.camera_distance and config.principal_point

        vec = np.asarray(config.rotation_unit_vec, dtype=np.float64)
        vec = vec / np.linalg.norm(vec)
        theta = float(np.clip(config.rotation_theta, -89, 89)) / 180 * np.pi
        self.rotation_vec = vec * theta
        self.rotation_mat = rodrigues(self.rotation_vec)

        principal_point = list(config.principal_point)
        if len(principal_point) == 2:
            principal_point.append(0)
        principal_point = np.asarray(principal_point, dtype=np.float64).reshape(3, 1)

        # Solve t so that R @ p + t == (0, 0, camera_distance).
        cc_principal = np.asarray([0, 0, config.camera_distance], dtype=np.float64)
        cc_principal = cc_principal.reshape(3, 1)
        wc_shifted = self.rotation_mat.T @ cc_principal - principal_point
        self.translation_vec = self.rotation_mat @ wc_shifted

        self.focal_length = float(config.focal_length)

    def project_np_points_from_3d_to_2d(self, np_3d_points: np.ndarray) -> np.ndarray:
        pts = np.asarray(np_3d_points, dtype=np.float64).reshape(-1, 3)
        cam = pts @ self.rotation_mat.T + self.translation_vec.reshape(1, 3)
        z = cam[:, 2:3]
        z = np.where(np.abs(z) < 1e-12, 1e-12, z)
        return self.focal_length * cam[:, :2] / z


class CameraPointProjector(PointProjector):

    def __init__(
        self,
        point_2d_to_3d_strategy: Point2dTo3dStrategy,
        camera_model_config: CameraModelConfig,
    ):
        self.point_2d_to_3d_strategy = point_2d_to_3d_strategy
        self.camera_model = CameraModel(camera_model_config)

    def project_points(self, src_points: Union[PointList, PointTuple]) -> PointTuple:
        np_3d_points = self.point_2d_to_3d_strategy.generate_np_3d_points(
            PointTuple(src_points)
        )
        camera_2d_points = self.camera_model.project_np_points_from_3d_to_2d(np_3d_points)
        return PointTuple.from_xy_pairs(
            (float(x), float(y)) for x, y in camera_2d_points
        )

    def project_point(self, src_point: Point) -> Point:
        return self.project_points(PointTuple.from_point(src_point))[0]


class DistortionStateCameraOperation(DistortionStateImageGridBased[_T_CONFIG]):

    @classmethod
    def complete_camera_model_config(
        cls,
        height: int,
        width: int,
        camera_model_config: CameraModelConfig,
    ) -> CameraModelConfig:
        if camera_model_config.principal_point \
                and camera_model_config.focal_length \
                and camera_model_config.camera_distance:
            return camera_model_config

        camera_model_config = attr.evolve(camera_model_config)
        if not camera_model_config.principal_point:
            camera_model_config.principal_point = [height // 2, width // 2]
        if not camera_model_config.focal_length \
                or not camera_model_config.camera_distance:
            camera_model_config.focal_length = max(height, width)
            camera_model_config.camera_distance = camera_model_config.focal_length
        return camera_model_config

    def initialize_camera_operation(
        self,
        height: int,
        width: int,
        grid_size: int,
        point_2d_to_3d_strategy: Point2dTo3dStrategy,
        camera_model_config: CameraModelConfig,
    ):
        src_image_grid = create_src_image_grid(height, width, grid_size)
        camera_model_config = self.complete_camera_model_config(
            height, width, camera_model_config
        )
        point_projector = CameraPointProjector(
            point_2d_to_3d_strategy, camera_model_config
        )
        self.initialize_image_grid_based(src_image_grid, point_projector)


# ---------------------------------------------------------------------------
# plane_only
# ---------------------------------------------------------------------------


@attr.define
class CameraPlaneOnlyConfig(DistortionConfig):
    camera_model_config: CameraModelConfig
    grid_size: int


class CameraPlaneOnlyPoint2dTo3dStrategy(Point2dTo3dStrategy):

    def generate_np_3d_points(self, points: PointTuple) -> np.ndarray:
        np_2d_points = points.to_smooth_np_array()
        return np.hstack((
            np_2d_points,
            np.zeros((np_2d_points.shape[0], 1), dtype=np.float32),
        ))


class CameraPlaneOnlyState(DistortionStateCameraOperation[CameraPlaneOnlyConfig]):

    def __init__(self, config: CameraPlaneOnlyConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        height, width = shape
        self.initialize_camera_operation(
            height, width, config.grid_size,
            CameraPlaneOnlyPoint2dTo3dStrategy(),
            config.camera_model_config,
        )


camera_plane_only = DistortionImageGridBased(
    config_cls=CameraPlaneOnlyConfig,
    state_cls=CameraPlaneOnlyState,
)


# ---------------------------------------------------------------------------
# cubic_curve
# ---------------------------------------------------------------------------


@attr.define
class CameraCubicCurveConfig(DistortionConfig):
    curve_alpha: float
    curve_beta: float
    # Clockwise, [0, 180].
    curve_direction: float
    curve_scale: float
    camera_model_config: CameraModelConfig
    grid_size: int


class CameraCubicCurvePoint2dTo3dStrategy(Point2dTo3dStrategy):
    """z follows a cubic with endpoint slopes (alpha, beta) along the
    projected direction (camera.py:313-429)."""

    def __init__(self, height: int, width: int, curve_alpha: float,
                 curve_beta: float, curve_direction: float, curve_scale: float):
        self.height = height
        self.width = width
        self.curve_alpha = math.tan(np.clip(curve_alpha, -80, 80) / 180 * np.pi)
        self.curve_beta = math.tan(np.clip(curve_beta, -80, 80) / 180 * np.pi)
        self.curve_direction = (curve_direction % 180) / 180 * np.pi

        self.rotation_mat = np.asarray(
            [
                [math.cos(self.curve_direction), math.sin(self.curve_direction)],
                [-math.sin(self.curve_direction), math.cos(self.curve_direction)],
            ],
            dtype=np.float64,
        )

        corners = np.asarray(
            [[0, 0], [width - 1, 0], [width - 1, height - 1], [0, height - 1]],
            dtype=np.float64,
        )
        rotated = self.rotation_mat @ corners.T
        self.plane_projection_min = rotated[0].min()
        self.plane_projection_range = rotated[0].max() - self.plane_projection_min
        self.curve_scale = curve_scale

    def generate_np_3d_points(self, points: PointTuple) -> np.ndarray:
        np_2d_points = points.to_smooth_np_array().astype(np.float64)
        projected = self.rotation_mat @ np_2d_points.T
        ratios = (projected[0] - self.plane_projection_min) / self.plane_projection_range

        # Cubic through (0,0) and (1,0) with slopes alpha at 0, beta at 1.
        poly = np.asarray([
            self.curve_alpha + self.curve_beta,
            -2 * self.curve_alpha - self.curve_beta,
            self.curve_alpha,
            0,
        ])
        pos_zs = np.polyval(poly, ratios)
        pos_zs = pos_zs * self.plane_projection_range * self.curve_scale
        pos_zs = pos_zs - pos_zs.mean()
        return np.hstack((np_2d_points, pos_zs.reshape(-1, 1)))


class CameraCubicCurveState(DistortionStateCameraOperation[CameraCubicCurveConfig]):

    def __init__(self, config: CameraCubicCurveConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        height, width = shape
        self.initialize_camera_operation(
            height, width, config.grid_size,
            CameraCubicCurvePoint2dTo3dStrategy(
                height, width,
                config.curve_alpha, config.curve_beta,
                config.curve_direction, config.curve_scale,
            ),
            config.camera_model_config,
        )


camera_cubic_curve = DistortionImageGridBased(
    config_cls=CameraCubicCurveConfig,
    state_cls=CameraCubicCurveState,
)


# ---------------------------------------------------------------------------
# plane_line_fold / plane_line_curve
# ---------------------------------------------------------------------------


class CameraPlaneLinePoint2dTo3dStrategy(Point2dTo3dStrategy):
    """Perturb the plane along a 3-D vector, weighted by distance to a line
    (camera.py:434-481)."""

    def __init__(self, height: int, width: int, point: Tuple[float, float],
                 direction: float, perturb_vec: Tuple[float, float, float],
                 alpha: float,
                 weights_func: Callable[[np.ndarray, float], np.ndarray]):
        self.height = height
        self.width = width

        self.point = np.asarray(point, dtype=np.float64)
        direction = (direction % 180) / 180 * np.pi
        cos_theta = np.cos(direction)
        sin_theta = np.sin(direction)
        self.line_params_a_b = np.asarray([sin_theta, -cos_theta], dtype=np.float64)
        self.line_param_c = -self.point[0] * sin_theta + self.point[1] * cos_theta

        self.distance_max = np.sqrt(height**2 + width**2)
        self.alpha = alpha
        self.weights_func = weights_func
        self.perturb_vec = np.asarray(perturb_vec, dtype=np.float64)

    def generate_np_3d_points(self, points: PointTuple) -> np.ndarray:
        np_2d_points = points.to_smooth_np_array().astype(np.float64)
        distances = np.abs(
            (np_2d_points * self.line_params_a_b).sum(axis=1) + self.line_param_c
        )
        norm_distances = distances / self.distance_max
        weights = self.weights_func(norm_distances, self.alpha)

        np_3d_points = np.hstack(
            (np_2d_points, np.zeros((np_2d_points.shape[0], 1)))
        )
        np_perturb = weights.reshape(-1, 1) * self.perturb_vec
        np_perturb -= np_perturb.mean(axis=0)
        return np_3d_points + np_perturb


@attr.define
class CameraPlaneLineFoldConfig(DistortionConfig):
    fold_point: Tuple[float, float]
    # Clockwise, [0, 180].
    fold_direction: float
    fold_perturb_vec: Tuple[float, float, float]
    fold_alpha: float
    camera_model_config: CameraModelConfig
    grid_size: int


class CameraPlaneLineFoldState(DistortionStateCameraOperation[CameraPlaneLineFoldConfig]):

    @classmethod
    def weights_func(cls, norm_distances: np.ndarray, alpha: float) -> np.ndarray:
        return alpha / (norm_distances + alpha)

    def __init__(self, config: CameraPlaneLineFoldConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        height, width = shape
        self.initialize_camera_operation(
            height, width, config.grid_size,
            CameraPlaneLinePoint2dTo3dStrategy(
                height=height,
                width=width,
                point=config.fold_point,
                direction=config.fold_direction,
                perturb_vec=config.fold_perturb_vec,
                alpha=config.fold_alpha,
                weights_func=self.weights_func,
            ),
            config.camera_model_config,
        )


camera_plane_line_fold = DistortionImageGridBased(
    config_cls=CameraPlaneLineFoldConfig,
    state_cls=CameraPlaneLineFoldState,
)


@attr.define
class CameraPlaneLineCurveConfig(DistortionConfig):
    curve_point: Tuple[float, float]
    # Clockwise, [0, 180].
    curve_direction: float
    curve_perturb_vec: Tuple[float, float, float]
    curve_alpha: float
    camera_model_config: CameraModelConfig
    grid_size: int


class CameraPlaneLineCurveState(DistortionStateCameraOperation[CameraPlaneLineCurveConfig]):

    @classmethod
    def weights_func(cls, norm_distances: np.ndarray, alpha: float) -> np.ndarray:
        return 1 - norm_distances**alpha

    def __init__(self, config: CameraPlaneLineCurveConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        height, width = shape
        self.initialize_camera_operation(
            height, width, config.grid_size,
            CameraPlaneLinePoint2dTo3dStrategy(
                height=height,
                width=width,
                point=config.curve_point,
                direction=config.curve_direction,
                perturb_vec=config.curve_perturb_vec,
                alpha=config.curve_alpha,
                weights_func=self.weights_func,
            ),
            config.camera_model_config,
        )


camera_plane_line_curve = DistortionImageGridBased(
    config_cls=CameraPlaneLineCurveConfig,
    state_cls=CameraPlaneLineCurveState,
)
