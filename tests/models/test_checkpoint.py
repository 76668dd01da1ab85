"""Checkpoint save/restore roundtrip + retention, and the step timer."""
import jax
import numpy as np

from vkit_tpu.models import (
    CheckpointManager,
    TrainBatch,
    create_model,
    create_optimizer,
    init_train_state,
    make_train_step,
)
from vkit_tpu.utility import StepTimer


def _setup():
    model = create_model(stage_features=(32, 64), fpn_features=32)
    optimizer = create_optimizer()
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    half = 16
    batch = TrainBatch(
        images=images,
        char_masks=np.zeros((2, half, half), dtype=np.float32),
        char_heights=np.zeros((2, half, half), dtype=np.float32),
        char_gaussians=np.zeros((2, half, half), dtype=np.float32),
    )
    state = init_train_state(model, optimizer, images[:1])
    return model, optimizer, state, batch


def test_checkpoint_roundtrip(tmp_path):
    model, optimizer, state, batch = _setup()
    step_fn = jax.jit(make_train_step(model, optimizer))
    state, _ = step_fn(state, batch)

    manager = CheckpointManager(tmp_path, max_to_keep=2)
    manager.save(state, metadata={'samples_seen': 2})

    restored = manager.restore(state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert manager.read_metadata()['samples_seen'] == 2

    # Resume continues bit-exact vs an uninterrupted run.
    cont_a, _ = step_fn(state, batch)
    cont_b, _ = step_fn(restored, batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(cont_a), jax.tree_util.tree_leaves(cont_b)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_retention(tmp_path):
    model, optimizer, state, batch = _setup()
    step_fn = jax.jit(make_train_step(model, optimizer))
    manager = CheckpointManager(tmp_path, max_to_keep=2)
    for _ in range(4):
        state, _ = step_fn(state, batch)
        manager.save(state)
    assert manager.all_steps() == [3, 4]
    assert manager.latest_step() == 4


def test_step_timer():
    timer = StepTimer()
    with timer.measure('a'):
        pass
    with timer.measure('a'):
        pass
    with timer.measure('b'):
        pass
    summary = timer.summary()
    assert summary['a']['count'] == 2
    assert summary['b']['count'] == 1
    timer.reset()
    assert not timer.summary()


def test_checkpoint_sharded_roundtrip(tmp_path):
    """tp-sharded params survive save (gather) + restore (re-shard)."""
    import jax
    import numpy as np

    from vkit_tpu.models import (
        TrainBatch, create_model, create_optimizer, init_train_state,
    )
    from vkit_tpu.models.checkpoint import CheckpointManager
    from vkit_tpu.parallel import make_mesh, shard_params_for_tp

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip('needs >= 2 devices')

    mesh = make_mesh(len(jax.devices()))
    model = create_model(stage_features=(32, 64, 128, 256), fpn_features=64)
    state = init_train_state(
        model, create_optimizer(),
        np.zeros((2, 32, 32, 3), np.uint8), seed=0,
    )
    shardings = shard_params_for_tp(state, mesh)
    state = jax.device_put(state, shardings)

    manager = CheckpointManager(tmp_path)
    manager.save(state, metadata={'k': 1})
    restored = manager.restore(state)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Restored leaves carry the example's sharding.
    leaf = jax.tree_util.tree_leaves(restored.params)[0]
    assert leaf.sharding == jax.tree_util.tree_leaves(state.params)[0].sharding
    assert manager.read_metadata()['k'] == 1
    # No stray tmp dirs.
    assert not list(tmp_path.glob('*.tmp'))
