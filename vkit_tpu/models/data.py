"""Synth pipeline -> training batches: the real label feed.

Bridges synth.device.SynthBatchResult (batched page images + warped label
channels) into models.train.TrainBatch on device: labels pool to the
model's stride-2 output grid, and the gaussian-centroid target derives
from the char mask with a separable gaussian (the reference's
char_heatmap engine renders per-char gaussians host-side,
vkit/engine/char_heatmap/default.py:30-180; at stride 2 the blurred mask
is the tensor-first stand-in).
"""
import jax
import jax.numpy as jnp

from ..ops.blur import filter2d, gaussian_kernel1d
from ..synth.prep import CHAR_HEIGHT, CHAR_MASK
from .train import TrainBatch


@jax.jit
def synth_to_train_batch(images, label_stack, active_masks,
                         char_gaussians=None) -> TrainBatch:
    """(images u8 (N,H,W,3), label_stack f32 (N,H,W,4), active u8) ->
    TrainBatch with stride-2 label grids, all on device.

    ``char_gaussians``: optional (N, H, W) per-char quad-warped gaussian
    maps from synthesize_page_batch(emit_char_gaussians=True) — the
    reference-faithful centroid target; without it the blurred char mask
    stands in."""
    char_mask = label_stack[..., CHAR_MASK]
    char_height = label_stack[..., CHAR_HEIGHT]
    active = active_masks.astype(jnp.float32)

    char_mask = char_mask * active
    char_height = char_height * active

    def pool2(x):
        n, h, w = x.shape
        return x.reshape(n, h // 2, 2, w // 2, 2).max(axis=(2, 4))

    mask_2 = (pool2(char_mask) > 0.5).astype(jnp.float32)
    height_2 = pool2(char_height) * 0.5  # heights follow the 2x downsample

    if char_gaussians is not None:
        gaussian_2 = pool2(char_gaussians * active)
    else:
        k1 = gaussian_kernel1d(2.0, 9)
        kernel = jnp.asarray(k1[:, None] * k1[None, :], dtype=jnp.float32)
        gaussian_2 = jax.vmap(
            lambda m: filter2d(m[..., None], kernel)[..., 0]
        )(mask_2)
        gaussian_2 = gaussian_2 / jnp.maximum(
            gaussian_2.max(axis=(1, 2), keepdims=True), 1e-6
        )

    return TrainBatch(
        images=images,
        char_masks=mask_2,
        char_heights=height_2,
        char_gaussians=gaussian_2,
    )


def evaluate(model, params, batches):
    """Mean eval metrics over TrainBatches: char-mask IoU@0.5, height MAE
    on text pixels, gaussian MSE."""
    @jax.jit
    def eval_one(params, batch: TrainBatch):
        mask_logits, height_raw, gaussian_logits = model.apply(
            {'params': params}, batch.images
        )
        pred_mask = (jax.nn.sigmoid(mask_logits[..., 0]) > 0.5)
        target = batch.char_masks > 0.5
        inter = (pred_mask & target).sum()
        union = jnp.maximum((pred_mask | target).sum(), 1)

        pred_height = jax.nn.softplus(height_raw[..., 0])
        on_text = batch.char_masks
        height_mae = (
            jnp.abs(pred_height - batch.char_heights) * on_text
        ).sum() / jnp.maximum(on_text.sum(), 1.0)

        gaussian = jax.nn.sigmoid(gaussian_logits[..., 0])
        gaussian_mse = ((gaussian - batch.char_gaussians) ** 2).mean()
        return inter / union, height_mae, gaussian_mse

    totals = jnp.zeros(3)
    count = 0
    for batch in batches:
        totals = totals + jnp.asarray(eval_one(params, batch))
        count += 1
    iou, height_mae, gaussian_mse = (totals / max(count, 1)).tolist()
    return {
        'char_mask_iou': float(iou),
        'char_height_mae': float(height_mae),
        'gaussian_mse': float(gaussian_mse),
    }
