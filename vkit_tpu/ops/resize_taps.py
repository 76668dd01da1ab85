"""Resize tap-weight construction + pure-numpy resize.

Capability parity: the cv2.resize interpolation family used throughout the
reference (vkit/element/image.py:847, mask.py:471, score_map.py:628,
vkit/utility/opt.py:125-148): NEAREST, NEAREST_EXACT, LINEAR(_EXACT), CUBIC,
AREA, LANCZOS4.

Design: every separable resize is expressed as two dense weight matrices,
``out = W_rows @ img @ W_cols.T``.  On TPU the same matrices drive the MXU
(see vkit_tpu/ops/resize.py); on host this module applies them with numpy.
This file must not import jax (the element layer depends on it).
"""
from enum import Enum, unique
from typing import Tuple

import numpy as np


@unique
class Interpolation(Enum):
    NEAREST = 'nearest'
    NEAREST_EXACT = 'nearest_exact'
    LINEAR = 'linear'
    LINEAR_EXACT = 'linear_exact'
    CUBIC = 'cubic'
    AREA = 'area'
    LANCZOS4 = 'lanczos4'


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic with A=-0.75 (OpenCV's INTER_CUBIC coefficient)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _lanczos_kernel(x: np.ndarray, a: int = 4) -> np.ndarray:
    out = np.sinc(x) * np.sinc(x / a)
    return np.where(np.abs(x) < a, out, 0.0)


def build_resize_weights(
    n_src: int,
    n_dst: int,
    interpolation: Interpolation,
) -> np.ndarray:
    """(n_dst, n_src) float32 row-stochastic weight matrix."""
    assert n_src > 0 and n_dst > 0
    scale = n_src / n_dst
    dst = np.arange(n_dst, dtype=np.float64)

    if interpolation is Interpolation.NEAREST:
        src_idx = np.floor(dst * scale).astype(np.int64)
        src_idx = np.clip(src_idx, 0, n_src - 1)
        weights = np.zeros((n_dst, n_src), dtype=np.float32)
        weights[dst.astype(np.int64), src_idx] = 1.0
        return weights

    if interpolation is Interpolation.NEAREST_EXACT:
        src_idx = np.floor((dst + 0.5) * scale).astype(np.int64)
        src_idx = np.clip(src_idx, 0, n_src - 1)
        weights = np.zeros((n_dst, n_src), dtype=np.float32)
        weights[dst.astype(np.int64), src_idx] = 1.0
        return weights

    if interpolation is Interpolation.AREA:
        # Exact fractional pixel coverage of [i*scale, (i+1)*scale) — valid
        # in BOTH directions: for upscale the cell straddles at most two
        # source pixels (integer upscale degenerates to nearest, matching
        # cv2.INTER_AREA).
        weights = np.zeros((n_dst, n_src), dtype=np.float64)
        starts = dst * scale
        ends = starts + scale
        for i in range(n_dst):
            lo = starts[i]
            hi = ends[i]
            j0 = int(np.floor(lo))
            j1 = min(int(np.ceil(hi)), n_src)
            for j in range(j0, j1):
                cover = min(hi, j + 1) - max(lo, j)
                if cover > 0:
                    weights[i, j] = cover / scale
        return weights.astype(np.float32)

    # Convolutional kernels share the half-pixel-center mapping.
    centers = (dst + 0.5) * scale - 0.5

    if interpolation in (Interpolation.LINEAR, Interpolation.LINEAR_EXACT):
        radius, kernel = 1, None
    elif interpolation is Interpolation.CUBIC:
        radius, kernel = 2, _cubic_kernel
    elif interpolation is Interpolation.LANCZOS4:
        radius, kernel = 4, _lanczos_kernel
    else:
        raise NotImplementedError(interpolation)

    base = np.floor(centers).astype(np.int64)
    weights = np.zeros((n_dst, n_src), dtype=np.float64)
    taps = np.arange(1 - radius, radius + 1)
    for tap in taps:
        idx = base + tap
        dist = centers - idx
        if kernel is None:
            w = np.maximum(0.0, 1.0 - np.abs(dist))
        else:
            w = kernel(dist)
        clipped = np.clip(idx, 0, n_src - 1)
        np.add.at(weights, (np.arange(n_dst), clipped), w)
    # Normalize rows (cv2 normalizes tap sums).
    weights /= weights.sum(axis=1, keepdims=True)
    return weights.astype(np.float32)


def resize_np(
    mat: np.ndarray,
    resized_shape: Tuple[int, int],
    interpolation: Interpolation = Interpolation.LINEAR,
) -> np.ndarray:
    """Resize an (H, W) or (H, W, C) numpy array; preserves dtype."""
    resized_height, resized_width = resized_shape
    height, width = mat.shape[:2]
    if (height, width) == (resized_height, resized_width):
        return mat.copy()

    w_rows = build_resize_weights(height, resized_height, interpolation).astype(np.float64)
    w_cols = build_resize_weights(width, resized_width, interpolation).astype(np.float64)

    flat = mat.reshape(height, -1).astype(np.float64)
    out = w_rows @ flat  # (H', W*C)
    out = out.reshape(resized_height, width, -1)
    out = np.einsum('hwc,vw->hvc', out, w_cols)
    out = out.reshape(resized_height, resized_width, *mat.shape[2:])

    if np.issubdtype(mat.dtype, np.integer):
        info = np.iinfo(mat.dtype)
        out = np.clip(np.round(out), info.min, info.max)
    return out.astype(mat.dtype)
