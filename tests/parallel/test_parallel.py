"""Parallel layer: mesh factoring, batched synthesis, prefetch pump."""
import jax
import jax.numpy as jnp
import numpy as np

from vkit_tpu.parallel import (
    DevicePrefetcher,
    batch_sharding,
    factor_devices,
    make_mesh,
    sample_synthesis_params,
    synthesize_batch,
)


def test_factor_devices():
    assert factor_devices(8, 3) == (2, 2, 2)
    assert factor_devices(4, 3) == (2, 2, 1)
    assert factor_devices(6, 3) == (3, 2, 1)
    assert factor_devices(1, 3) == (1, 1, 1)
    assert factor_devices(16, 2) == (4, 4)


def test_make_mesh_and_sharding():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {'dp': 2, 'sp': 2, 'tp': 2}
    sharding = batch_sharding(mesh)
    spec = sharding.spec
    assert spec[0] == 'dp' and spec[1] == 'sp'


def test_synthesize_batch_small():
    rng = np.random.default_rng(0)
    n, h, w = 2, 64, 64
    images = jnp.asarray(rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
    params, warp_statics = sample_synthesis_params(rng, n, h, w, level=3)
    out = synthesize_batch(
        images, params, jax.random.PRNGKey(0),
        warp_statics=warp_statics, out_shape=(h, w),
    )
    out = np.asarray(out)
    assert out.shape == (n, h, w, 3)
    assert out.dtype == np.uint8
    # Distortion actually happened and differs across samples.
    assert not np.array_equal(out[0], np.asarray(images[0]))
    assert not np.array_equal(out[0], out[1])


def test_synthesize_batch_deterministic():
    rng = np.random.default_rng(7)
    n, h, w = 2, 64, 64
    images = jnp.asarray(rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8))
    params, warp_statics = sample_synthesis_params(rng, n, h, w)
    key = jax.random.PRNGKey(3)
    out1 = np.asarray(
        synthesize_batch(images, params, key, warp_statics=warp_statics)
    )
    out2 = np.asarray(
        synthesize_batch(images, params, key, warp_statics=warp_statics)
    )
    assert np.array_equal(out1, out2)


def test_prefetcher():
    batches = [np.full((4, 8), idx, dtype=np.float32) for idx in range(5)]
    seen = [np.asarray(b)[0, 0] for b in DevicePrefetcher(iter(batches), depth=2)]
    assert seen == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_prefetcher_propagates_errors():
    def gen():
        yield np.zeros((2,))
        raise ValueError('boom')

    pf = DevicePrefetcher(gen())
    next(pf)
    try:
        next(pf)
        raise AssertionError('expected ValueError')
    except ValueError:
        pass


def test_transform_label_points_matches_warp():
    from vkit_tpu.parallel import transform_label_points

    rng = np.random.default_rng(3)
    n, h, w = 2, 96, 96
    images = np.zeros((n, h, w, 3), dtype=np.uint8)
    p_src = np.array([[30.0, 40.0], [64.0, 20.0]])  # xy per sample
    for i, (x, y) in enumerate(p_src):
        images[i, int(y) - 1:int(y) + 2, int(x) - 1:int(x) + 2] = 255

    params, warp_statics = sample_synthesis_params(rng, n, h, w, level=4)
    # Photometric off: isolate the geometry.
    params = params._replace(
        contrasts=jnp.ones(n), brightnesses=jnp.zeros(n),
        noise_stds=jnp.zeros(n), jpeg_enables=jnp.zeros(n),
    )
    out = np.asarray(synthesize_batch(
        jnp.asarray(images), params, jax.random.PRNGKey(0),
        warp_statics=warp_statics,
    ))

    predicted = transform_label_points(params, p_src[:, None, :])[:, 0]
    for i in range(n):
        px, py = predicted[i]
        assert 2 <= px < w - 2 and 2 <= py < h - 2
        patch = out[i, int(py) - 3:int(py) + 4, int(px) - 3:int(px) + 4]
        assert patch.max() > 100  # the dot landed where predicted


def test_synth_device_programs_shard_over_dp():
    """The synth device programs are batch-parallel: with dp-sharded
    inputs on the 8-device CPU mesh, outputs match the unsharded run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    from vkit_tpu.mechanism.photometric_program import (
        apply_mega_round,
        build_round_params,
    )
    from vkit_tpu.parallel import make_mesh

    mesh = make_mesh(8, axis_names=('dp',))
    n = 8
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (n, 32, 48, 3),
                                          dtype=np.uint8)
    )
    sel_np, params = build_round_params(n, {})
    sel_np[:] = 8  # color_balance for every sample
    params['cb_ratio'][:] = 0.5
    params_dev = {k: jnp.asarray(v) for k, v in params.items()}
    seed = np.uint32(0)

    want = np.asarray(
        apply_mega_round(images, jnp.asarray(sel_np), params_dev, seed)
    )

    dp = NamedSharding(mesh, PartitionSpec('dp'))
    images_sharded = jax.device_put(images, dp)
    sel_sharded = jax.device_put(jnp.asarray(sel_np), dp)
    params_sharded = {
        k: jax.device_put(v, NamedSharding(
            mesh, PartitionSpec('dp', *([None] * (v.ndim - 1)))
        ))
        for k, v in params_dev.items()
    }
    got = np.asarray(apply_mega_round(
        images_sharded, sel_sharded, params_sharded, seed
    ))
    np.testing.assert_array_equal(got, want)
