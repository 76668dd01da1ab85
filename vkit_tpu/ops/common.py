"""Shared device-side helpers."""
import jax.numpy as jnp


def to_f32(image):
    return image.astype(jnp.float32)


def round_u8(image):
    """Round + saturate to uint8 (cv2-style)."""
    return jnp.clip(jnp.round(image), 0, 255).astype(jnp.uint8)


def expand_chw(image):
    """Ensure a trailing channel dim; returns (image3d, had_channels)."""
    if image.ndim == 2:
        return image[..., None], False
    return image, True
