"""Steady-state probe: count XLA compiles / jit traces / dispatches per
batch AFTER warmup for the bench workloads, on any backend.

Usage:
    JAX_PLATFORMS=cpu python tools/steady_state_probe.py [5|6|both]

A steady-state batch must show 0 compiles and 0 traces; anything else is
a per-batch compile/retrace leak (VERDICT r4 item 1).
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

if not os.environ.get('VKIT_TPU_PROBE_ON_TPU'):
    # sitecustomize pre-imports jax with the axon backend registered;
    # backends initialize lazily, so reconfiguring here still selects CPU.
    import jax
    jax.config.update('jax_platforms', 'cpu')

COUNTS = {'compiles': 0, 'traces': 0}
TRACE_NAMES = {}
COMPILE_NAMES = {}


def install_counters():
    from jax._src import compiler
    from jax._src.interpreters import partial_eval as pe

    orig_compile = compiler.compile_or_get_cached

    def counting_compile(backend, computation, *args, **kwargs):
        COUNTS['compiles'] += 1
        try:
            from vkit_tpu.utility.guard import _module_name
            name = _module_name(computation)
        except Exception:  # noqa: BLE001
            name = '<unknown>'
        COMPILE_NAMES[name] = COMPILE_NAMES.get(name, 0) + 1
        return orig_compile(backend, computation, *args, **kwargs)

    compiler.compile_or_get_cached = counting_compile

    orig_trace = pe.trace_to_jaxpr_dynamic

    def counting_trace(fun, *args, **kwargs):
        COUNTS['traces'] += 1
        name = getattr(getattr(fun, 'f', None), '__name__', None) or \
            getattr(fun, '__name__', repr(fun)[:60])
        TRACE_NAMES[name] = TRACE_NAMES.get(name, 0) + 1
        return orig_trace(fun, *args, **kwargs)

    pe.trace_to_jaxpr_dynamic = counting_trace


def snap():
    c = dict(COUNTS)
    COUNTS['compiles'] = 0
    COUNTS['traces'] = 0
    TRACE_NAMES.clear()
    COMPILE_NAMES.clear()
    return c


def report(tag, t, extra=''):
    c = dict(COUNTS)
    tn = sorted(TRACE_NAMES.items(), key=lambda kv: -kv[1])[:12]
    cn = sorted(COMPILE_NAMES.items(), key=lambda kv: -kv[1])[:12]
    print(f'{tag}: {t:.2f}s compiles={c["compiles"]} traces={c["traces"]} '
          f'{extra}')
    if c['traces']:
        print(f'   traces: {tn}')
    if c['compiles']:
        print(f'   compiles: {cn}')
    snap()


def probe_config5(n_batches=4, warm=False):
    import jax
    import jax.numpy as jnp

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
    labels = jnp.asarray(
        np.ones((batch, SIDE, SIDE, 2), dtype=np.float32)
    )
    key = jax.random.PRNGKey(0)

    if warm:
        from vkit_tpu.mechanism.warmup import warmup_random_distortion
        t0 = time.perf_counter()
        warmup_random_distortion(
            batch, (SIDE, SIDE), out_shape, warp_channels=5, level=5
        )
        report('[warmup]', time.perf_counter() - t0)

    def step():
        photo = batch_random_photometric_distort(images, 5, rng, key=key)
        raw_plans = sample_geometric_plans(batch, (SIDE, SIDE), 5, rng)
        plans = [rescale_plan_to(p, out_shape) for p in raw_plans]
        stack = jnp.concatenate(
            [photo.astype(jnp.float32), labels], axis=-1
        )
        out = batched_plan_warp(plans, stack, mode='auto')[0]
        for plan in plans:
            plan_content_box(plan)
        return float(jnp.asarray(out[:, ::64, ::64, 0]).mean())

    for i in range(n_batches):
        t0 = time.perf_counter()
        step()
        report(f'[cfg5 batch {i}]', time.perf_counter() - t0)


def probe_config6(n_batches=4, region=False):
    from tests.pipeline.fixtures import build_assets
    from vkit_tpu.synth import (
        CropConfig,
        SynthPlanner,
        SynthPlannerConfig,
        synthesize_stream,
    )

    SIDE = 640
    assets = build_assets(Path('/tmp/bench_synth_assets'))
    selector = [{
        'type': 'selector', 'weight': 1,
        'config': {'image_folders': [assets['bg_image_folder']]},
    }]
    planner = SynthPlanner(SynthPlannerConfig(
        lexicon_collection_json=assets['lexicon_json'],
        font_collection_folder=assets['font_collection_folder'],
        char_sampler_configs=[{
            'type': 'corpus', 'weight': 1,
            'config': {'txt_files': [assets['corpus_txt']]},
        }],
        page_height=SIDE, page_width=SIDE,
        background_image_configs=selector,
        image_configs=selector,
        symbol_image_folders=[assets['symbol_image_folder']],
        enable_barcodes=True,
        enable_seal_impressions=True,
        enable_text_line_bounding_boxes=True,
    ))
    rng = np.random.default_rng(11)
    crop = CropConfig(core_size=512, num_per_page=2)
    region_config = None
    if region:
        from vkit_tpu.synth.region import RegionStreamConfig
        region_config = RegionStreamConfig()

    i = 0
    snap()
    for _ in synthesize_stream(planner, 8, 5, rng, num_batches=n_batches,
                               crop_config=crop,
                               region_config=region_config):
        report(f'[cfg6 batch {i}]', 0.0)
        i += 1


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    install_counters()
    if which in ('5', 'both'):
        t0 = time.perf_counter()
        probe_config5()
        print(f'config5 total {time.perf_counter() - t0:.1f}s')
    if which == '5w':
        t0 = time.perf_counter()
        probe_config5(warm=True)
        print(f'config5+warm total {time.perf_counter() - t0:.1f}s')
    if which in ('6', 'both'):
        t0 = time.perf_counter()
        probe_config6()
        print(f'config6 total {time.perf_counter() - t0:.1f}s')
    if which == '6r':
        t0 = time.perf_counter()
        probe_config6(region=True)
        print(f'config6+region total {time.perf_counter() - t0:.1f}s')
