"""Training step for the text-detection net, mesh-sharded.

Loss heads mirror the pipeline's labels (vkit/pipeline/text_detection/
page_text_region_label.py outputs): balanced BCE on the char mask, masked
smooth-L1 on char height (log-scaled), MSE on the gaussian centroid map.
The step is a pure function jitted once over the mesh; dp shards the batch,
sp shards activation rows (XLA inserts conv halo exchanges), tp shards wide
channels (XLA inserts all-reduces).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .text_detection import TextDetectionNet


class TrainBatch(NamedTuple):
    images: jnp.ndarray               # (N, H, W, 3) uint8
    char_masks: jnp.ndarray           # (N, H/2, W/2) uint8/f32 {0,1}
    char_heights: jnp.ndarray         # (N, H/2, W/2) f32 (pixels, 0 = bg)
    char_gaussians: jnp.ndarray       # (N, H/2, W/2) f32 in [0,1]


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def create_model(**kwargs) -> TextDetectionNet:
    return TextDetectionNet(**kwargs)


def create_optimizer(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=1e-4)


def init_train_state(
    model: TextDetectionNet,
    optimizer: optax.GradientTransformation,
    example_images,
    seed: int = 0,
) -> TrainState:
    params = model.init(jax.random.PRNGKey(seed), example_images)['params']
    opt_state = optimizer.init(params)
    return TrainState(
        params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)
    )


def loss_fn(model: TextDetectionNet, params, batch: TrainBatch):
    mask_logits, height_raw, gaussian_logits = model.apply(
        {'params': params}, batch.images
    )
    mask_logits = mask_logits[..., 0]
    height_raw = height_raw[..., 0]
    gaussian = jax.nn.sigmoid(gaussian_logits[..., 0])

    target_mask = batch.char_masks.astype(jnp.float32)

    # Balanced BCE: weight positives by the inverse class frequency so the
    # sparse text pixels are not drowned out.
    pos_frac = jnp.clip(target_mask.mean(), 1e-3, 1.0 - 1e-3)
    pos_weight = (1.0 - pos_frac) / pos_frac
    bce = optax.sigmoid_binary_cross_entropy(mask_logits, target_mask)
    bce = bce * (target_mask * (pos_weight - 1.0) + 1.0)
    mask_loss = bce.mean()

    # Char height: smooth-L1 in log space, only on text pixels.
    pred_height = jax.nn.softplus(height_raw)
    log_err = jnp.log1p(pred_height) - jnp.log1p(batch.char_heights)
    huber = optax.huber_loss(log_err, delta=1.0)
    denom = jnp.maximum(target_mask.sum(), 1.0)
    height_loss = (huber * target_mask).sum() / denom

    gaussian_loss = ((gaussian - batch.char_gaussians) ** 2).mean()

    total = mask_loss + height_loss + 10.0 * gaussian_loss
    return total, {
        'loss': total,
        'mask_loss': mask_loss,
        'height_loss': height_loss,
        'gaussian_loss': gaussian_loss,
    }


def make_train_step(model: TextDetectionNet, optimizer):
    """Returns the pure (state, batch) -> (state, metrics) step function."""

    def train_step(state: TrainState, batch: TrainBatch):
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch), has_aux=True
        )
        (_, metrics), grads = grad_fn(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        ), metrics

    return train_step
