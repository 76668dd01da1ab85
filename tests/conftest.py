"""Test harness config: run on a virtual 8-device CPU mesh.

This machine's sitecustomize pre-imports jax and registers the remote 'axon'
TPU backend, so env vars alone cannot select CPU — but backends initialize
lazily, so reconfiguring here (before any jax.devices() call) still works.
Set VKIT_TPU_TEST_ON_TPU=1 to run the suite against the real chip instead.
"""
import os

if not os.environ.get('VKIT_TPU_TEST_ON_TPU'):
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8'
        ).strip()
    import jax

    jax.config.update('jax_platforms', 'cpu')
