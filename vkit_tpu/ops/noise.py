"""Noise kernels with jax threaded PRNG.

Capability parity: vkit/mechanism/distortion/photometric/noise.py:25-190
(gaussian, poisson, impulse salt/pepper, speckle).  The reference threads a
stateful numpy Generator; here every op takes an explicit jax PRNG key —
deterministic given (key, params), which is strictly stronger for replay.
"""
import jax
import jax.numpy as jnp

from .common import round_u8, to_f32


def gaussian_noise(key, image, std: float):
    noise = jax.random.normal(key, image.shape, dtype=jnp.float32) * std
    out = to_f32(image) + noise
    return round_u8(out) if image.dtype == jnp.uint8 else out


def poisson_noise(key, image):
    out = jax.random.poisson(key, to_f32(image), dtype=jnp.int32)
    return round_u8(out) if image.dtype == jnp.uint8 else out.astype(image.dtype)


def impulse_noise(key, image, prob_salt: float, prob_pepper: float):
    key_sel = jax.random.fold_in(key, 0)
    u = jax.random.uniform(key_sel, image.shape[:2])
    salt = u < prob_salt
    pepper = (u >= prob_salt) & (u < prob_salt + prob_pepper)
    out = image
    if image.ndim == 3:
        salt = salt[..., None]
        pepper = pepper[..., None]
    out = jnp.where(salt, jnp.asarray(255, dtype=image.dtype), out)
    out = jnp.where(pepper, jnp.asarray(0, dtype=image.dtype), out)
    return out


def speckle_noise(key, image, std: float):
    noise = jax.random.normal(key, image.shape, dtype=jnp.float32) * std
    out = to_f32(image) * (1.0 + noise)
    return round_u8(out) if image.dtype == jnp.uint8 else out
