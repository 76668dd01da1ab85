"""Similarity Moving-Least-Squares deformation.

Capability parity: vkit/mechanism/distortion/geometric/mls.py:31-164
(Schaefer et al., "Image Deformation Using Moving Least Squares",
similarity transform variant).  Unlike the reference's per-point solver, the
projector is vectorized over all query points at once (one einsum chain for
the whole grid lattice).
"""
from typing import Optional, Tuple

import attr
import numpy as np
from numpy.random import Generator as RandomGenerator

from ....element import PointTuple
from ..interface import DistortionConfig
from .grid_rendering.grid_creator import create_src_image_grid
from .grid_rendering.interface import (
    DistortionImageGridBased,
    DistortionStateImageGridBased,
)
from .grid_rendering.point_projector import PointProjector


@attr.define
class SimilarityMlsConfig(DistortionConfig):
    src_handle_points: PointTuple
    dst_handle_points: PointTuple
    grid_size: int
    resize_as_src: bool = False


class SimilarityMlsPointProjector(PointProjector):

    def __init__(self, src_handle_points: PointTuple, dst_handle_points: PointTuple):
        self.src_handle_points = src_handle_points
        self.dst_handle_points = dst_handle_points
        self.np_src = src_handle_points.to_smooth_np_array().astype(np.float64)
        self.np_dst = dst_handle_points.to_smooth_np_array().astype(np.float64)

    def project_np_points(self, np_points_xy: np.ndarray) -> np.ndarray:
        """Vectorized similarity-MLS: (V, 2) queries -> (V, 2) deformed."""
        v = np.asarray(np_points_xy, dtype=np.float64)  # (V, 2)
        p = self.np_src  # (N, 2)
        q = self.np_dst  # (N, 2)

        diff = v[:, None, :] - p[None, :, :]  # (V, N, 2)
        dist_sq = (diff**2).sum(axis=-1)  # (V, N)
        exact = dist_sq < 1e-12  # exact handle hits -> identity mapping

        w = 1.0 / np.where(exact, 1.0, dist_sq)  # (V, N)
        w = np.where(exact, 0.0, w)
        w_sum = w.sum(axis=1, keepdims=True)
        w_sum = np.where(w_sum == 0, 1.0, w_sum)

        p_star = (w[..., None] * p[None]).sum(axis=1) / w_sum  # (V, 2)
        q_star = (w[..., None] * q[None]).sum(axis=1) / w_sum  # (V, 2)

        p_hat = p[None, :, :] - p_star[:, None, :]  # (V, N, 2)
        q_hat = q[None, :, :] - q_star[:, None, :]  # (V, N, 2)

        d = v - p_star  # (V, 2)
        d_perp = np.stack([-d[:, 1], d[:, 0]], axis=1)  # (V, 2) = (v - p*)^perp
        p_hat_perp = np.stack([-p_hat[..., 1], p_hat[..., 0]], axis=-1)  # (V, N, 2)

        # f_s(v) = sum_i q_hat_i . (w_i [[ p_hat; -p_hat_perp ]] [[d; -d_perp]]^T) / mu + q*
        a00 = (p_hat * d[:, None, :]).sum(-1)          # p_hat . d
        a01 = -(p_hat * d_perp[:, None, :]).sum(-1)    # p_hat . (-d_perp)
        a10 = -(p_hat_perp * d[:, None, :]).sum(-1)    # -p_hat_perp . d
        a11 = (p_hat_perp * d_perp[:, None, :]).sum(-1)

        fx = w * (q_hat[..., 0] * a00 + q_hat[..., 1] * a10)
        fy = w * (q_hat[..., 0] * a01 + q_hat[..., 1] * a11)

        mu = (w * (p_hat**2).sum(-1)).sum(axis=1)  # (V,)
        mu = np.where(mu == 0, 1.0, mu)
        out = np.stack([fx.sum(1), fy.sum(1)], axis=1) / mu[:, None] + q_star

        # Exact handle hits map to the corresponding dst handle.
        if exact.any():
            idx_v, idx_n = np.nonzero(exact)
            out[idx_v] = q[idx_n]
        return out


class SimilarityMlsState(DistortionStateImageGridBased[SimilarityMlsConfig]):

    def __init__(self, config: SimilarityMlsConfig, shape: Tuple[int, int],
                 rng: Optional[RandomGenerator]):
        height, width = shape
        self.initialize_image_grid_based(
            create_src_image_grid(height, width, config.grid_size),
            SimilarityMlsPointProjector(
                config.src_handle_points,
                config.dst_handle_points,
            ),
            resize_as_src=config.resize_as_src,
        )
        # Debug visibility (mls.py:158-159).
        self.dst_handle_points = list(
            map(self.shift_and_resize_point, config.dst_handle_points)
        )


similarity_mls = DistortionImageGridBased(
    config_cls=SimilarityMlsConfig,
    state_cls=SimilarityMlsState,
)
