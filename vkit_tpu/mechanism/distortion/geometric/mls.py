"""Similarity Moving-Least-Squares deformation.

Schaefer et al., "Image Deformation Using Moving Least Squares" (similarity
variant), fully vectorized over all query points.  Behavioral spec:
vkit/mechanism/distortion/geometric/mls.py:31-164 (re-derived).
"""
import attr
import numpy as np

from ....element import PointTuple
from ..interface import DistortionConfig, GeometricDistortion
from ..warp_plan import WarpPlan, lattice_plan


@attr.define
class SimilarityMlsConfig(DistortionConfig):
    src_handle_points: PointTuple
    dst_handle_points: PointTuple
    grid_size: int
    resize_as_src: bool = False


def similarity_mls_map(
    np_src_handles: np.ndarray,
    np_dst_handles: np.ndarray,
    np_queries: np.ndarray,
) -> np.ndarray:
    """Vectorized similarity-MLS: (V, 2) queries -> (V, 2) deformed."""
    v = np.asarray(np_queries, dtype=np.float64)
    p = np.asarray(np_src_handles, dtype=np.float64)
    q = np.asarray(np_dst_handles, dtype=np.float64)

    diff = v[:, None, :] - p[None, :, :]            # (V, N, 2)
    dist_sq = (diff**2).sum(axis=-1)                # (V, N)
    exact = dist_sq < 1e-12                         # handle hits -> identity

    w = 1.0 / np.where(exact, 1.0, dist_sq)
    w = np.where(exact, 0.0, w)
    w_sum = w.sum(axis=1, keepdims=True)
    w_sum = np.where(w_sum == 0, 1.0, w_sum)

    p_star = (w[..., None] * p[None]).sum(axis=1) / w_sum
    q_star = (w[..., None] * q[None]).sum(axis=1) / w_sum

    p_hat = p[None, :, :] - p_star[:, None, :]
    q_hat = q[None, :, :] - q_star[:, None, :]

    d = v - p_star
    d_perp = np.stack([-d[:, 1], d[:, 0]], axis=1)
    p_hat_perp = np.stack([-p_hat[..., 1], p_hat[..., 0]], axis=-1)

    a00 = (p_hat * d[:, None, :]).sum(-1)
    a01 = -(p_hat * d_perp[:, None, :]).sum(-1)
    a10 = -(p_hat_perp * d[:, None, :]).sum(-1)
    a11 = (p_hat_perp * d_perp[:, None, :]).sum(-1)

    fx = w * (q_hat[..., 0] * a00 + q_hat[..., 1] * a10)
    fy = w * (q_hat[..., 0] * a01 + q_hat[..., 1] * a11)

    mu = (w * (p_hat**2).sum(-1)).sum(axis=1)
    mu = np.where(mu == 0, 1.0, mu)
    out = np.stack([fx.sum(1), fy.sum(1)], axis=1) / mu[:, None] + q_star

    if exact.any():
        idx_v, idx_n = np.nonzero(exact)
        out[idx_v] = q[idx_n]
    return out


def _similarity_mls_plan(config: SimilarityMlsConfig, shape, rng) -> WarpPlan:
    np_src = np.asarray(
        [(pt.smooth_x, pt.smooth_y) for pt in config.src_handle_points],
        dtype=np.float64,
    )
    np_dst = np.asarray(
        [(pt.smooth_x, pt.smooth_y) for pt in config.dst_handle_points],
        dtype=np.float64,
    )
    return lattice_plan(
        shape,
        config.grid_size,
        lambda queries: similarity_mls_map(np_src, np_dst, queries),
        resize_as_src=config.resize_as_src,
    )


similarity_mls = GeometricDistortion(SimilarityMlsConfig, _similarity_mls_plan)
