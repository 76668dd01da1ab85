"""batch_distort_images_compiled must equal the eager dispatch for every
catalog name, with policy-sampled configs (the production draw source)."""
import jax
import numpy as np
import pytest

from vkit_tpu.mechanism.batched import (
    _COMPILED_CATALOG,
    batch_distort_images,
    batch_distort_images_compiled,
)
from vkit_tpu.mechanism.distortion_policy.random_distortion import (
    random_distortion_factory,
)


def _policy_by_name():
    stage_configs = [
        random_distortion_factory.create_photometric_stage_config(),
    ]
    policies = {}
    for stage_config in stage_configs:
        for policy in stage_config.distortion_policies:
            policies[policy.name] = policy
    return policies


POLICIES = _policy_by_name()
RNG_CONSUMING = {
    'gaussion_noise', 'poisson_noise', 'impulse_noise', 'speckle_noise',
    'channel_permutation', 'fog', 'glass_blur',
}


@pytest.mark.parametrize('name', sorted(_COMPILED_CATALOG))
def test_compiled_matches_eager(name):
    policy = POLICIES.get(name)
    if policy is None:
        pytest.skip(f'{name} not in the photometric stage catalog')
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (3, 64, 80, 3), dtype=np.uint8)
    )
    configs = [
        policy.sample_config(5, (64, 80), rng) for _ in range(3)
    ]
    # Static/shape params must agree for a shared batched apply.
    from vkit_tpu.mechanism.batched_random import _static_signature
    sig0 = _static_signature(name, configs[0])
    configs = [
        c if _static_signature(name, c) == sig0 else configs[0]
        for c in configs
    ]
    if name in ('pixelation', 'zoom_in_blur'):
        configs = [configs[0]] * 3

    key = jax.random.PRNGKey(7)
    try:
        want = np.asarray(batch_distort_images(name, configs, images, key))
    except AssertionError:
        configs = [configs[0]] * 3
        want = np.asarray(batch_distort_images(name, configs, images, key))
    got = np.asarray(
        batch_distort_images_compiled(name, configs, images, key)
    )
    if name == 'brightness_shift':
        # The HSL round-trip quantizes an intermediate to uint8; XLA's
        # fusion reassociation moves half-ULP values across the rounding
        # boundary between the eager and jitted programs.
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 8 and diff.mean() < 0.5
        return
    if name in RNG_CONSUMING:
        # Same key, same draw structure -> identical noise for most; fog /
        # glass_blur re-derive host rng from the key, so just sanity-check.
        assert got.shape == want.shape
        if name not in ('fog', 'glass_blur'):
            np.testing.assert_array_equal(got, want)
        return
    np.testing.assert_array_equal(got, want)
