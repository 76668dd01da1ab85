"""Flagship model: forward shapes, train step runs, loss decreases."""
import jax
import numpy as np

from vkit_tpu.models import (
    TrainBatch,
    create_model,
    create_optimizer,
    init_train_state,
    make_train_step,
)


def _tiny_batch(n=2, side=32, seed=0):
    rng = np.random.default_rng(seed)
    half = side // 2
    images = rng.integers(0, 256, (n, side, side, 3), dtype=np.uint8)
    masks = np.zeros((n, half, half), dtype=np.float32)
    masks[:, 4:12, 4:12] = 1.0
    heights = masks * 8.0
    gaussians = masks * 0.8
    return TrainBatch(
        images=images, char_masks=masks,
        char_heights=heights, char_gaussians=gaussians,
    )


def test_forward_shapes():
    model = create_model()
    batch = _tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch.images)['params']
    mask_logits, height_raw, gaussian_logits = model.apply(
        {'params': params}, batch.images
    )
    assert mask_logits.shape == (2, 16, 16, 1)
    assert height_raw.shape == (2, 16, 16, 1)
    assert gaussian_logits.shape == (2, 16, 16, 1)


def test_train_step_reduces_loss():
    model = create_model(stage_features=(32, 64), fpn_features=32)
    optimizer = create_optimizer(learning_rate=3e-3)
    batch = _tiny_batch()
    state = init_train_state(model, optimizer, batch.images[:1])
    train_step = jax.jit(make_train_step(model, optimizer))

    state, metrics0 = train_step(state, batch)
    for _ in range(5):
        state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    assert float(metrics['loss']) < float(metrics0['loss'])
    assert int(state.step) == 6
