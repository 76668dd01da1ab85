"""Config-5 steady-state measurement on the real chip, with phase timing
and the guard compile counter.  Run: python tools/tpu_steady5.py [batches]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(n_timed=6):
    import jax
    import jax.numpy as jnp

    from vkit_tpu.utility import (
        compile_count,
        enable_compilation_cache,
        reset_compile_log,
        recent_compile_names,
    )
    enable_compilation_cache()

    from vkit_tpu.mechanism.batched import batched_plan_warp
    from vkit_tpu.mechanism.batched_random import (
        batch_random_photometric_distort,
        sample_geometric_plans,
    )
    from vkit_tpu.mechanism.distortion.warp_plan import (
        plan_content_box,
        rescale_plan_to,
    )

    SIDE = 640
    batch = 32
    out_shape = (704, 704)
    rng = np.random.default_rng(4)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, SIDE, SIDE, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(np.ones((batch, SIDE, SIDE, 2), dtype=np.float32))
    key = jax.random.PRNGKey(0)

    phases = {}

    def mark(name, t0):
        t = time.perf_counter()
        phases[name] = phases.get(name, 0.0) + (t - t0)
        return t

    pending = [None]

    def step(collect=False):
        t0 = time.perf_counter()
        photo = batch_random_photometric_distort(images, 5, rng, key=key)
        if collect:
            t0 = mark('photometric', t0)
        raw_plans = sample_geometric_plans(batch, (SIDE, SIDE), 5, rng)
        plans = [rescale_plan_to(p, out_shape) for p in raw_plans]
        if collect:
            t0 = mark('plan_sample', t0)
        stack = jnp.concatenate(
            [photo.astype(jnp.float32), labels], axis=-1
        )
        out = batched_plan_warp(plans, stack, mode='auto')[0]
        if collect:
            t0 = mark('warp_dispatch', t0)
        for plan in plans:
            plan_content_box(plan)
        if collect:
            t0 = mark('content_box', t0)
        if pending[0] is not None:
            float(jnp.asarray(pending[0][:, ::64, ::64, 0]).mean())
        pending[0] = out
        if collect:
            mark('force_prev', t0)

    # Warm until clean: no compiles for 2 consecutive batches.
    clean, warm_batches = 0, 0
    while clean < 4 and warm_batches < 40:
        before = compile_count()
        t0 = time.perf_counter()
        step()
        dt = time.perf_counter() - t0
        delta = compile_count() - before
        clean = clean + 1 if delta == 0 else 0
        warm_batches += 1
        print(f'warm {warm_batches}: {dt:.2f}s compiles={delta} '
              f'{recent_compile_names(6) if delta else ""}', flush=True)
    reset_compile_log()

    begin = time.perf_counter()
    for _ in range(n_timed):
        step(collect=True)
    float(jnp.asarray(pending[0][:, ::64, ::64, 0]).mean())
    secs = (time.perf_counter() - begin) / n_timed
    print(f'steady: {batch / secs:.1f} img/s ({secs:.3f}s/batch), '
          f'compiles during timing={compile_count()}')
    for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f'  {k}: {v / n_timed * 1e3:.0f} ms/batch')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
