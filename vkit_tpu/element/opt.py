"""Element-level array helpers, including the masked/alpha blend primitive.

Capability parity: vkit/element/opt.py:23-209 (clip_val, resize_val, shape
helpers, expand_np_mask, prep_value, fill_np_array).  ``fill_np_array`` keeps
the exact blend semantics of the reference (masked write fast path, scalar and
per-pixel alpha in float32, keep-max/keep-min modes) — the device-side twin of
this primitive lives in vkit_tpu/ops/blend.py.
"""
from typing import Optional, Tuple, TypeVar, Union

import numpy as np

from .type import Shapable

_T = TypeVar('_T', float, int)


def clip_val(val: _T, size: int) -> _T:
    return max(0, min(val, size - 1))  # type: ignore[return-value]


def resize_val(val: _T, size: int, resized_size: int):
    return clip_val(val * resized_size / size, resized_size)


def extract_shape_from_shapable_or_shape(
    shapable_or_shape: Union[Shapable, Tuple[int, int]],
) -> Tuple[int, int]:
    if isinstance(shapable_or_shape, Shapable):
        return shapable_or_shape.shape
    height, width = shapable_or_shape
    return height, width


def generate_resized_shape(
    height: int,
    width: int,
    resized_height: Optional[int] = None,
    resized_width: Optional[int] = None,
) -> Tuple[int, int]:
    if not resized_height and not resized_width:
        raise RuntimeError('Missing resized_height or resized_width.')
    if resized_height is None:
        assert resized_width
        resized_height = round(resized_width * height / width)
    if resized_width is None:
        assert resized_height
        resized_width = round(resized_height * width / height)
    return resized_height, resized_width


def generate_shape_and_resized_shape(
    shapable_or_shape: Union[Shapable, Tuple[int, int]],
    resized_height: Optional[int] = None,
    resized_width: Optional[int] = None,
):
    height, width = extract_shape_from_shapable_or_shape(shapable_or_shape)
    resized_height, resized_width = generate_resized_shape(
        height=height,
        width=width,
        resized_height=resized_height,
        resized_width=resized_width,
    )
    return height, width, resized_height, resized_width


def expand_np_mask(mat: np.ndarray, np_mask: np.ndarray) -> np.ndarray:
    """Broadcast an (H, W) bool mask over trailing channels of ``mat``."""
    if mat.ndim == 2:
        return np_mask
    if mat.ndim == 3:
        return np.repeat(np.expand_dims(np_mask, axis=-1), mat.shape[2], axis=-1)
    raise NotImplementedError()


def prep_value(
    mat: np.ndarray,
    value: Union[np.ndarray, Tuple[float, ...], float],
) -> np.ndarray:
    if isinstance(value, np.ndarray):
        if mat.shape != value.shape:
            raise RuntimeError('value array shape mismatch.')
        if value.dtype != mat.dtype:
            value = value.astype(mat.dtype)
        return value
    if mat.ndim == 3 and isinstance(value, tuple) and len(value) != mat.shape[2]:
        raise RuntimeError('tuple value length != num_channels.')
    return np.full_like(mat, value)


def fill_np_array(
    mat: np.ndarray,
    value: Union[np.ndarray, Tuple[float, ...], float],
    np_mask: Optional[np.ndarray] = None,
    alpha: Union[np.ndarray, float] = 1.0,
    keep_max_value: bool = False,
    keep_min_value: bool = False,
) -> None:
    """In-place masked / alpha-weighted fill of ``mat`` with ``value``.

    Semantics match vkit/element/opt.py:118-209:
      * scalar value + mask + alpha 1.0 + no keep modes: plain masked write;
      * alpha float in (0, 1): float32 lerp, cast back to mat dtype;
      * alpha ndarray (H, W): per-pixel lerp (keep modes not applicable);
      * keep_max_value / keep_min_value: write only where value beats mat.
    """
    assert not (keep_max_value and keep_min_value)

    if (
        not isinstance(value, np.ndarray) and np_mask is not None
        and isinstance(alpha, float) and alpha == 1.0
        and not keep_max_value and not keep_min_value
    ):
        mat[np_mask] = value
        return

    np_value = prep_value(mat, value)

    if isinstance(alpha, float):
        if not 0.0 <= alpha <= 1.0:
            raise RuntimeError(f'alpha={alpha} is invalid.')
        if alpha == 0.0:
            return
        if alpha == 1.0:
            if keep_max_value or keep_min_value:
                if keep_max_value:
                    np_better = mat < np_value
                else:
                    np_better = mat > np_value
                if np_mask is not None:
                    np_better &= expand_np_mask(mat, np_mask.astype(bool))
                np.putmask(mat, np_better, np_value)
            elif np_mask is None:
                np.copyto(mat, np_value)
            else:
                mat[np_mask] = np_value[np_mask]
            return
        np_alpha = np.full(mat.shape[:2], alpha, dtype=np.float32)
    else:
        np_alpha = alpha.astype(np.float32)

    if np_alpha.shape != mat.shape:
        assert np_alpha.ndim + 1 == mat.ndim
        np_alpha = np.expand_dims(np_alpha, -1)

    np_blended = ((1.0 - np_alpha) * mat.astype(np.float32)
                  + np_alpha * np_value.astype(np.float32)).astype(mat.dtype)
    if np_mask is not None:
        mat[np_mask] = np_blended[np_mask]
    else:
        np.copyto(mat, np_blended)
