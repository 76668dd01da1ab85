"""The one-program photometric round must match the per-name compiled
dispatch for every covered op."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vkit_tpu.mechanism.batched import batch_distort_images_compiled
from vkit_tpu.mechanism.batched_random import (
    _static_signature,
    batch_random_photometric_distort,
)
from vkit_tpu.mechanism.photometric_program import (
    MEGA_NAMES,
    apply_mega_round,
    build_round_params,
)
from vkit_tpu.mechanism.distortion_policy.random_distortion import (
    random_distortion_factory,
)

RNG_CONSUMING = {
    'gaussion_noise', 'poisson_noise', 'impulse_noise', 'speckle_noise',
    'channel_permutation', 'fog',
}


def _policies():
    stage = random_distortion_factory.create_photometric_stage_config()
    return {p.name: p for p in stage.distortion_policies}


POLICIES = _policies()


@pytest.mark.parametrize('name', sorted(MEGA_NAMES))
def test_mega_matches_per_name(name):
    policy = POLICIES.get(name)
    if policy is None:
        pytest.skip(f'{name} not in the photometric stage catalog')
    rng = np.random.default_rng(3)
    n = 3
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (n, 48, 64, 3), dtype=np.uint8)
    )
    configs = [policy.sample_config(5, (48, 64), rng) for _ in range(n)]
    sig0 = _static_signature(name, configs[0])
    configs = [
        c if _static_signature(name, c) == sig0 else configs[0]
        for c in configs
    ]

    key = jax.random.PRNGKey(11)
    seed = 11
    want = np.asarray(
        batch_distort_images_compiled(name, configs, images, seed=seed)
    )

    sel, params = build_round_params(
        n, {name: list(enumerate(configs))}
    )
    got = np.asarray(apply_mega_round(
        images, jnp.asarray(sel),
        {k: jnp.asarray(v) for k, v in params.items()}, np.uint32(seed),
    ))

    if name in RNG_CONSUMING:
        assert got.shape == want.shape
        assert got.dtype == want.dtype
        return
    np.testing.assert_array_equal(got, want)


def test_mega_passthrough():
    """sel = -1 everywhere: the round is an exact identity."""
    images = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    )
    sel, params = build_round_params(2, {})
    got = np.asarray(apply_mega_round(
        images, jnp.asarray(sel),
        {k: jnp.asarray(v) for k, v in params.items()},
        np.uint32(0),
    ))
    np.testing.assert_array_equal(got, np.asarray(images))


def test_mega_mixed_round():
    """Different ops per sample in one round select independently."""
    rng = np.random.default_rng(5)
    n = 3
    images = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (n, 40, 40, 3), dtype=np.uint8)
    )
    names = ['complement', 'posterization', 'color_balance']
    members = {}
    for i, name in enumerate(names):
        cfg = POLICIES[name].sample_config(5, (40, 40), rng)
        members[name] = [(i, cfg)]

    sel, params = build_round_params(n, members)
    got = np.asarray(apply_mega_round(
        images, jnp.asarray(sel),
        {k: jnp.asarray(v) for k, v in params.items()}, np.uint32(9),
    ))

    for i, name in enumerate(names):
        cfg = members[name][0][1]
        want = np.asarray(batch_distort_images_compiled(
            name, [cfg] * n, images, seed=9
        ))
        np.testing.assert_array_equal(got[i], want[i])


def test_full_stage_runs_with_mega():
    rng = np.random.default_rng(7)
    images = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (6, 48, 48, 3), dtype=np.uint8)
    )
    out = batch_random_photometric_distort(images, 6, rng)
    assert out.shape == images.shape and out.dtype == jnp.uint8
    # At level 6 with 6 samples, at least one sample distorts.
    assert np.asarray(out != images).any()
