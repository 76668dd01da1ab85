"""Driver benchmark: the BASELINE.json workloads vs the MEASURED reference.

Prints per-config lines to stderr and ONE JSON line to stdout:
{"metric", "value", "unit", "vs_baseline"}.  The headline metric is
BASELINE config 5 — the full RandomDistortion pipeline (policy sampling
over the complete photometric + geometric catalog, label-raster
co-transform, analytic polygon/point co-transform, corner trim) — against
the ACTUAL reference running the same workload on this host's CPU
(BASELINE_REF.json, tools/measure_reference.py).

Configs (BASELINE.json):
  1. fixed distortion chain (affine warp + contrast/brightness + noise +
     JPEG sim + resize) @640^2            vs reference same chain
  2. affine warp + mask/score-map/polygon/point co-transform @640^2
                                          vs reference rotate w/ labels
  3. camera cubic-curve dense-field warp + labels @640^2
                                          vs reference camera_cubic_curve
  4. MLS similarity deformation + glyph text compositing @640^2
                                          vs reference similarity_mls
                                          (reference number EXCLUDES text
                                          rendering; ours includes it)
  5. full RandomDistortion pipeline @640^2 (headline)
                                          vs reference RandomDistortion
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
REF_FILE = REPO / 'BASELINE_REF.json'

SIDE = 640


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def load_reference() -> dict:
    if REF_FILE.exists():
        return json.loads(REF_FILE.read_text())
    log('BASELINE_REF.json missing — run tools/measure_reference.py; '
        'falling back to the last recorded numbers')
    return {
        'reference_fixed_chain_samples_per_sec': 8.57,
        'reference_random_distortion_samples_per_sec': 3.19,
    }


def _force(x) -> float:
    """Synchronize: fetch one scalar (block_until_ready is unreliable on
    the tunneled backend)."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).mean())


def _time_loop(fn, warmups: int = 2, iters: int = 3) -> float:
    """Seconds per iteration of fn (host+device, forced execution)."""
    for _ in range(warmups):
        fn()
    begin = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - begin) / iters


def _label_sample(rng):
    """Polygons + points shaped like the reference workload (64 + 64)."""
    polygons = []
    points = np.empty((64, 2), dtype=np.float64)
    cell = SIDE // 8
    i = 0
    for row in range(8):
        for col in range(8):
            up, left = row * cell + 4, col * cell + 4
            polygons.append(np.asarray([
                (left, up), (left + cell - 8, up),
                (left + cell - 8, up + cell // 2), (left, up + cell // 2),
            ], dtype=np.float64))
            points[i] = (left, up)
            i += 1
    return polygons, points


def _label_stack(batch: int, rng) -> np.ndarray:
    """(N, H, W, 2) float32: a full mask channel + a random score map."""
    stack = np.empty((batch, SIDE, SIDE, 2), dtype=np.float32)
    stack[..., 0] = 1.0
    stack[..., 1] = rng.random((batch, SIDE, SIDE), dtype=np.float32)
    return stack


def _transform_labels(plans, polygons, points):
    # One vectorized forward map per sample (the per-polygon loop is pure
    # Python overhead; the reference pays it per polygon, we don't).
    all_xy = np.concatenate(polygons + [points], axis=0)
    for plan in plans:
        plan.map_points(all_xy)


def bench_fixed_chain() -> float:
    """Config 1: the one-jit chain (parallel.synthesize_batch), timed as a
    lax.scan on-device loop (dispatch-free)."""
    import jax
    import jax.numpy as jnp

    from vkit_tpu.parallel import sample_synthesis_params, synthesize_batch

    batch, steps = 64, 12
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, SIDE, SIDE, 3), dtype=np.uint8)
    ))
    params, warp_statics = sample_synthesis_params(
        rng, batch, SIDE, SIDE, level=5
    )
    params = jax.device_put(params)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def timed_loop(images, params, key):
        def body(acc, step):
            out = synthesize_batch(
                images, params, jax.random.fold_in(key, step),
                warp_statics=warp_statics, out_shape=(SIDE, SIDE),
            )
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(steps))
        return acc

    float(timed_loop(images, params, key))  # compile + warm
    begin = time.perf_counter()
    float(timed_loop(images, params, key))
    return (steps * batch) / (time.perf_counter() - begin)


def bench_affine_labels() -> float:
    """Config 2: rotate warp moving image + mask + score map together,
    plus analytic polygon/point co-transform (the reference's
    rotate.distort workload)."""
    import jax.numpy as jnp

    from vkit_tpu.mechanism.batched import batched_plan_warp
    from vkit_tpu.mechanism.distortion import rotate

    batch = 64
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (batch, SIDE, SIDE, 3), dtype=np.uint8)
    stack = jnp.asarray(np.concatenate(
        [images.astype(np.float32), _label_stack(batch, rng)], axis=-1
    ))
    polygons, points = _label_sample(rng)

    state = {'angle': 17.0}

    def step():
        state['angle'] += 0.01  # distinct param draw, same program
        plans = [
            rotate.plan({'angle': state['angle']}, (SIDE, SIDE),
                        np.random.default_rng(0))
            for _ in range(batch)
        ]
        out = batched_plan_warp(plans, stack, canvas_shape=(832, 832))[0]
        _transform_labels(plans, polygons, points)
        _force(out[:, ::64, ::64, 0])

    secs = _time_loop(step)
    return batch / secs


def _camera_config():
    return {
        'curve_alpha': 12, 'curve_beta': -10, 'curve_direction': 0,
        'curve_scale': 1.0,
        'camera_model_config': {
            'rotation_unit_vec': [1.0, 0.0, 0.0], 'rotation_theta': 6,
        },
        'grid_size': 16,
    }


def bench_camera_labels() -> float:
    """Config 3: camera cubic-curve dense-field warp + labels."""
    import jax.numpy as jnp

    from vkit_tpu.mechanism.batched import batched_plan_warp
    from vkit_tpu.mechanism.distortion import camera_cubic_curve

    batch = 32
    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (batch, SIDE, SIDE, 3), dtype=np.uint8)
    stack = jnp.asarray(np.concatenate(
        [images.astype(np.float32), _label_stack(batch, rng)], axis=-1
    ))
    polygons, points = _label_sample(rng)
    config = _camera_config()

    state = {'alpha': 12.0}

    def step():
        state['alpha'] += 0.01
        cfg = dict(config, curve_alpha=state['alpha'])
        plans = [
            camera_cubic_curve.plan(cfg, (SIDE, SIDE),
                                    np.random.default_rng(0))
            for _ in range(batch)
        ]
        out = batched_plan_warp(
            plans, stack, canvas_shape=(704, 704), mode='auto'
        )[0]
        _transform_labels(plans, polygons, points)
        _force(out[:, ::64, ::64, 0])

    secs = _time_loop(step)
    return batch / secs


def bench_mls_glyphs() -> float:
    """Config 4: glyph text compositing onto the page batch, then an MLS
    similarity deformation of image + labels.  (The reference baseline is
    MLS alone — text rendering there is a separate host engine.)"""
    import jax.numpy as jnp

    from vkit_tpu.element import Point
    from vkit_tpu.mechanism.batched import batched_plan_warp
    from vkit_tpu.mechanism.distortion import similarity_mls
    from vkit_tpu.ops.glyph import build_placements, composite_glyphs

    batch = 32
    rng = np.random.default_rng(3)
    images = rng.integers(150, 256, (batch, SIDE, SIDE, 3), dtype=np.uint8)
    labels = jnp.asarray(_label_stack(batch, rng))
    polygons, points = _label_sample(rng)

    # A synthetic glyph atlas (64 tiles) + ~40 glyphs per page.
    tiles = rng.random((64, 24, 24)).astype(np.float32)
    rows = []
    for sample_id in range(batch):
        for _ in range(40):
            rows.append({
                'glyph_id': int(rng.integers(0, 64)),
                'sample_id': sample_id,
                'up': int(rng.integers(0, SIDE - 32)),
                'left': int(rng.integers(0, SIDE - 32)),
                'dst_h': int(rng.integers(16, 32)),
                'dst_w': int(rng.integers(16, 32)),
                'src_h': 24.0, 'src_w': 24.0,
                'color': np.zeros(3, dtype=np.float32),
            })
    placements = build_placements(rows, bucket=1024)

    mls_config = {
        'src_handle_points': [
            Point.create(y=100, x=100), Point.create(y=100, x=SIDE - 100),
            Point.create(y=SIDE - 100, x=100),
            Point.create(y=SIDE - 100, x=SIDE - 100),
        ],
        'dst_handle_points': [
            Point.create(y=120, x=90), Point.create(y=80, x=SIDE - 80),
            Point.create(y=SIDE - 110, x=130),
            Point.create(y=SIDE - 90, x=SIDE - 120),
        ],
        'grid_size': 16,
    }

    images_dev = jnp.asarray(images)

    def step():
        composited = composite_glyphs(images_dev, tiles, placements,
                                      out_tile=32)
        stack = jnp.concatenate(
            [composited.astype(jnp.float32), labels], axis=-1
        )
        plans = [
            similarity_mls.plan(mls_config, (SIDE, SIDE),
                                np.random.default_rng(0))
            for _ in range(batch)
        ]
        out = batched_plan_warp(
            plans, stack, canvas_shape=(704, 704), mode='auto'
        )[0]
        _transform_labels(plans, polygons, points)
        _force(out[:, ::64, ::64, 0])

    secs = _time_loop(step)
    return batch / secs


def bench_random_distortion() -> float:
    """Config 5 (headline): the full RandomDistortion pipeline — policy
    sampling over the whole catalog, photometric stage, geometric stage
    warping image + mask + score map in one program, analytic polygon /
    point co-transform, and the corner trim as content boxes."""
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

    batch = 32
    out_shape = (704, 704)   # static letterbox canvas for randomized draws
    rng = np.random.default_rng(4)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, SIDE, SIDE, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(_label_stack(batch, rng))
    polygons, points = _label_sample(rng)
    key = jax.random.PRNGKey(0)

    # Host planning for batch k+1 overlaps batch k's device execution
    # WITHOUT threads: all device calls enqueue asynchronously, so the
    # force for batch k-1 happens only after batch k's host work is done.
    # (A prep THREAD was measured 2.5x slower on this one-core host — it
    # steals GIL time instead of hiding under device waits.)
    pending = [None]

    def step():
        photo = batch_random_photometric_distort(images, 5, rng, key=key)
        raw_plans = sample_geometric_plans(batch, (SIDE, SIDE), 5, rng)
        plans = [rescale_plan_to(p, out_shape) for p in raw_plans]
        stack = jnp.concatenate(
            [photo.astype(jnp.float32), labels], axis=-1
        )
        out = batched_plan_warp(plans, stack, mode='auto')[0]
        _transform_labels(plans, polygons, points)
        # Corner trim: per-sample active content boxes (analytic — the
        # reference crops to the corner-point bbox, random_distortion.py:267).
        for plan in plans:
            plan_content_box(plan)
        if pending[0] is not None:
            _force(pending[0][:, ::64, ::64, 0])
        pending[0] = out

    secs = _time_loop(step, warmups=8, iters=6)
    _force(pending[0][:, ::64, ::64, 0])
    return batch / secs


def bench_synth_end_to_end() -> float:
    """End-to-end page synthesis (synth pipeline): layout + text sampling
    on host (overlapped), glyph compositing + photometric + geometric
    warp of image AND label rasters + height correction on device.

    Reference baseline: the ACTUAL 17-step vkit pipeline measured at
    0.106 pages/s/core by tools/measure_reference_pipeline.py (via
    tools/refshims for the uninstallable deps; BASELINE_REF.json,
    `reference_pipeline_17step_samples_per_sec`).
    """
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(REPO))  # `tests` package for asset builders
    from tests.pipeline.fixtures import build_assets
    from vkit_tpu.synth import (
        CropConfig,
        SynthPlanner,
        SynthPlannerConfig,
        synthesize_stream,
    )

    assets = build_assets(_Path('/tmp/bench_synth_assets'))
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
        # Full page content (every page_assembler layer).
        background_image_configs=selector,
        image_configs=selector,
        symbol_image_folders=[assets['symbol_image_folder']],
        enable_barcodes=True,
        enable_seal_impressions=True,
        enable_text_line_bounding_boxes=True,
    ))
    rng = np.random.default_rng(11)
    batch = 8
    crop = CropConfig(core_size=512, num_per_page=2)

    # Warm (compiles + atlas build).
    for _ in synthesize_stream(planner, batch, 5, rng, num_batches=2,
                               crop_config=crop):
        pass
    begin = time.perf_counter()
    count = 0
    crops = 0
    for result in synthesize_stream(planner, batch, 5, rng, num_batches=3,
                                    crop_config=crop):
        count += result.images.shape[0]
        if result.crop_images is not None:
            crops += result.crop_images.shape[0]
    log(f'    (emitted {crops} cropped training samples)')
    return count / (time.perf_counter() - begin)


def bench_text_region_device():
    """Device text-region forms (ops/region.py) vs their per-region host
    cost: region flatten (rotate+resize) and char gaussian heatmaps."""
    import jax.numpy as jnp

    from vkit_tpu.element import Image
    from vkit_tpu.mechanism.distortion import rotate
    from vkit_tpu.ops.region import (
        batch_char_heatmaps,
        batch_flatten_regions,
    )
    from vkit_tpu.engine.char_heatmap.default import build_np_distance
    from vkit_tpu.ops import warp as warp_ops

    rng = np.random.default_rng(5)
    src_tile, dst_tile, n = 128, 256, 24
    patches = rng.integers(0, 256, (n, src_tile, src_tile, 3), np.uint8)
    angles = rng.uniform(-30, 30, n)
    scales = rng.uniform(0.8, 1.4, n)

    def dev_flat():
        w, _ = batch_flatten_regions(
            jnp.asarray(patches), angles, scales, dst_tile
        )
        _force(w[:, ::64, ::64, 0])

    dev_flat()
    t0 = time.perf_counter()
    for _ in range(3):
        dev_flat()
    dev_flat_s = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for i in range(n):
        spun = rotate.distort(
            {'angle': float(angles[i])}, image=Image(mat=patches[i])
        )
        th = max(int(round(spun.image.height * scales[i])), 1)
        tw = max(int(round(spun.image.width * scales[i])), 1)
        spun.image.to_resized_image(th, tw)
    host_flat_s = time.perf_counter() - t0

    g = 256
    quads = []
    for _ in range(g):
        cx, cy = rng.uniform(14, 50, 2)
        wd, ht = rng.uniform(8, 13, 2)
        ang = rng.uniform(0, np.pi)
        dx = np.asarray([np.cos(ang), np.sin(ang)]) * wd
        dy = np.asarray([-np.sin(ang), np.cos(ang)]) * ht
        c = np.asarray([cx, cy])
        quads.append(np.stack([c - dx - dy, c + dx - dy,
                               c + dx + dy, c - dx + dy]))
    quads = np.stack(quads)

    def dev_heat():
        tiles = batch_char_heatmaps(quads, tile=64)
        _force(tiles[:, ::16, ::16])

    dev_heat()
    t0 = time.perf_counter()
    for _ in range(3):
        dev_heat()
    dev_heat_s = (time.perf_counter() - t0) / 3

    radius = 25
    norm = build_np_distance(radius) / radius
    np_bump = np.exp(-0.5 * (2.25 * norm) ** 2).astype(np.float32)
    edge = np_bump.shape[0] - 1
    bump_quad = np.asarray(
        [(0, 0), (edge, 0), (edge, edge), (0, edge)], dtype=np.float64
    )
    mats = warp_ops.solve_perspective_batch(
        np.broadcast_to(bump_quad, quads.shape), quads
    )
    t0 = time.perf_counter()
    for i in range(g):
        warp_ops.warp_perspective_np(np_bump, mats[i], (64, 64))
    host_heat_s = time.perf_counter() - t0

    return (host_flat_s / dev_flat_s, host_heat_s / dev_heat_s)


def main():
    from vkit_tpu.utility import enable_compilation_cache

    enable_compilation_cache()
    ref = load_reference()

    t0 = time.time()
    chain = bench_fixed_chain()
    ref_chain = ref.get('reference_fixed_chain_samples_per_sec', 8.57)
    log(f'[1] fixed distortion chain @640^2: {chain:.1f} img/s '
        f'(reference {ref_chain:.2f}/s -> {chain / ref_chain:.1f}x) '
        f'[{time.time() - t0:.0f}s]')

    t0 = time.time()
    affine = bench_affine_labels()
    ref_affine = ref.get('reference_rotate_with_labels_samples_per_sec')
    log(f'[2] affine warp + label co-transform: {affine:.1f} samples/s'
        + (f' (reference {ref_affine:.2f}/s -> {affine / ref_affine:.1f}x)'
           if ref_affine else '')
        + f' [{time.time() - t0:.0f}s]')

    t0 = time.time()
    camera = bench_camera_labels()
    ref_camera = ref.get('reference_camera_cubic_curve_samples_per_sec')
    log(f'[3] camera cubic-curve warp + labels: {camera:.1f} samples/s'
        + (f' (reference {ref_camera:.2f}/s -> {camera / ref_camera:.1f}x)'
           if ref_camera else '')
        + f' [{time.time() - t0:.0f}s]')

    t0 = time.time()
    mls = bench_mls_glyphs()
    ref_mls = ref.get('reference_similarity_mls_samples_per_sec')
    log(f'[4] MLS deformation + glyph compositing: {mls:.1f} samples/s'
        + (f' (reference MLS-only {ref_mls:.2f}/s -> {mls / ref_mls:.1f}x)'
           if ref_mls else '')
        + f' [{time.time() - t0:.0f}s]')

    t0 = time.time()
    rd = bench_random_distortion()
    ref_rd = ref.get('reference_random_distortion_samples_per_sec', 3.19)
    log(f'[5] full RandomDistortion pipeline: {rd:.1f} samples/s '
        f'(reference {ref_rd:.2f}/s -> {rd / ref_rd:.1f}x) '
        f'[{time.time() - t0:.0f}s]')

    t0 = time.time()
    ref_synth = ref.get('reference_pipeline_17step_samples_per_sec')
    try:
        synth = bench_synth_end_to_end()
        log(f'[6] end-to-end page synthesis (layout+text+labels+distort): '
            f'{synth:.2f} pages/s'
            + (f' (measured reference 17-step pipeline {ref_synth:.3f}/s '
               f'-> {synth / ref_synth:.0f}x)' if ref_synth else '')
            + f' [{time.time() - t0:.0f}s]')
    except Exception as exc:  # noqa: BLE001 - optional info row
        synth = None
        log(f'[6] end-to-end page synthesis skipped: {exc!r}')

    try:
        flat_x, heat_x = bench_text_region_device()
        log(f'[7] text-region device forms: region flatten {flat_x:.0f}x, '
            f'char heatmaps {heat_x:.0f}x vs per-region host')
    except Exception as exc:  # noqa: BLE001 - optional info row
        log(f'[7] text-region device forms skipped: {exc!r}')

    print(json.dumps({
        'metric': (
            'full RandomDistortion pipeline @640x640 '
            '(policy sampling + full catalog + label co-transform + trim)'
        ),
        'value': round(rd, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(rd / ref_rd, 2),
        'configs': {
            'fixed_chain': {
                'value': round(chain, 2),
                'vs_reference': round(chain / ref_chain, 2),
            },
            'affine_with_labels': {
                'value': round(affine, 2),
                'vs_reference': (
                    round(affine / ref_affine, 2) if ref_affine else None
                ),
            },
            'camera_cubic_curve_with_labels': {
                'value': round(camera, 2),
                'vs_reference': (
                    round(camera / ref_camera, 2) if ref_camera else None
                ),
            },
            'mls_with_glyph_compositing': {
                'value': round(mls, 2),
                'vs_reference_mls_only': (
                    round(mls / ref_mls, 2) if ref_mls else None
                ),
            },
            'end_to_end_page_synthesis': {
                'value': round(synth, 2) if synth else None,
                'vs_reference': (
                    round(synth / ref_synth, 1)
                    if synth and ref_synth else None
                ),
                'note': (
                    'reference = the ACTUAL 17-step vkit pipeline run '
                    'via tools/measure_reference_pipeline.py (refshims)'
                ),
            },
        },
    }))


if __name__ == '__main__':
    main()
