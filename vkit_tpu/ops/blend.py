"""Device-side blend primitive — the jnp twin of element/opt.fill_np_array.

Capability parity: vkit/element/opt.py:118-209, operating functionally on
batched tensors (no in-place mutation; returns the blended array).
"""
from typing import Optional, Union

import jax.numpy as jnp

from .common import round_u8, to_f32


def blend(
    mat,
    value,
    np_mask: Optional[jnp.ndarray] = None,
    alpha: Union[jnp.ndarray, float] = 1.0,
    keep_max_value: bool = False,
    keep_min_value: bool = False,
):
    """Functional masked/alpha blend.  ``mat`` (..., H, W[, C]); ``value``
    broadcastable to mat; ``np_mask`` bool (H, W); ``alpha`` scalar or
    (H, W) float in [0, 1]."""
    assert not (keep_max_value and keep_min_value)
    value = jnp.broadcast_to(jnp.asarray(value, dtype=mat.dtype), mat.shape)

    if keep_max_value:
        value = jnp.maximum(mat, value)
    elif keep_min_value:
        value = jnp.minimum(mat, value)

    alpha_arr = jnp.asarray(alpha, dtype=jnp.float32)
    if alpha_arr.ndim and mat.ndim == alpha_arr.ndim + 1:
        alpha_arr = alpha_arr[..., None]

    blended = (1.0 - alpha_arr) * to_f32(mat) + alpha_arr * to_f32(value)
    if mat.dtype == jnp.uint8:
        blended = round_u8(blended)
    else:
        blended = blended.astype(mat.dtype)

    if np_mask is not None:
        mask = np_mask
        if mat.ndim == mask.ndim + 1:
            mask = mask[..., None]
        blended = jnp.where(mask, blended, mat)
    return blended
