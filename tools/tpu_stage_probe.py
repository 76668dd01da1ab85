"""Per-stage forced latency of the config-5 step on the real chip.

Separates the 0.45 s/batch device chain (BENCH r5 phase 'force') into
photometric / warp / fetch contributions by forcing after each stage.
Run AFTER warmup so no stage compiles.

Usage: python tools/tpu_stage_probe.py
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from vkit_tpu.mechanism.batched import batched_plan_warp
    from vkit_tpu.mechanism.batched_random import (
        batch_random_photometric_distort,
        sample_geometric_plans,
    )
    from vkit_tpu.mechanism.distortion.warp_plan import rescale_plan_to
    from vkit_tpu.mechanism.warmup import warmup_random_distortion
    from vkit_tpu.utility import enable_compilation_cache

    enable_compilation_cache()

    SIDE, batch, out_shape = 640, 32, (704, 704)
    rng = np.random.default_rng(4)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, SIDE, SIDE, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(
        np.ones((batch, SIDE, SIDE, 2), dtype=np.float32)
    )
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    warmup_random_distortion(batch, (SIDE, SIDE), out_shape,
                             warp_channels=5, level=5)
    print(f'warmup {time.perf_counter() - t0:.0f}s')

    def force(x):
        return float(jnp.asarray(x).astype(jnp.float32).mean())

    def measure(tag, fn, iters=6):
        fn()  # warm residuals
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        dt = (time.perf_counter() - t0) / iters
        print(f'{tag}: {dt * 1e3:.0f} ms/batch')
        return dt

    # A. photometric only
    def step_photo():
        photo = batch_random_photometric_distort(images, 5, rng, key=key)
        force(photo[:, ::64, ::64, 0])

    # B. photo + concat + warp
    def step_warp():
        photo = batch_random_photometric_distort(images, 5, rng, key=key)
        plans = [rescale_plan_to(p, out_shape) for p in
                 sample_geometric_plans(batch, (SIDE, SIDE), 5, rng)]
        stack = jnp.concatenate([photo.astype(jnp.float32), labels], -1)
        out = batched_plan_warp(plans, stack, mode='auto')[0]
        force(out[:, ::64, ::64, 0])

    # C. warp only (fixed photo input, random plans)
    fixed = images.astype(jnp.float32)
    stack_fixed = jnp.concatenate([fixed, labels], -1)

    def step_warp_only():
        plans = [rescale_plan_to(p, out_shape) for p in
                 sample_geometric_plans(batch, (SIDE, SIDE), 5, rng)]
        out = batched_plan_warp(plans, stack_fixed, mode='auto')[0]
        force(out[:, ::64, ::64, 0])

    # D. null chain: one tiny program + force (tunnel floor)
    tiny = jnp.zeros((8, 8))

    def step_null():
        force(tiny + 1.0)

    measure('null (tunnel floor)', step_null, iters=20)
    measure('photo only', step_photo)
    measure('warp only', step_warp_only)
    measure('photo+warp', step_warp)


if __name__ == '__main__':
    main()
