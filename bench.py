"""Driver benchmark: full distortion pipeline @640x640, images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The TPU path is vkit_tpu.parallel.synthesize_batch — the whole catalog slice
(affine warp + contrast/brightness + gaussian noise + JPEG DCT sim + resize)
as one jitted batch program.  The baseline is the same per-image chain run
on CPU through the host-side numpy ops (algorithmically equivalent to the
reference's per-image cv2 pipeline; the reference itself is not importable
here — it requires shapely/pyclipper which are not installed).  The CPU
number is measured once and cached in BASELINE_CPU.json.
"""
import json
import os
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
CPU_BASELINE_FILE = REPO / 'BASELINE_CPU.json'

BATCH = 64
HEIGHT = WIDTH = 640
STEPS = 12


def measure_cpu_baseline() -> float:
    """images/sec for the equivalent per-image chain on CPU.

    Implemented with cv2, exactly the calls the reference's distortions make
    (vkit/mechanism/distortion/geometric/affine.py cv.warpAffine;
    photometric/effect.py cv.imencode/imdecode) — a *favorable* stand-in for
    the reference, which adds Python orchestration on top.  Falls back to
    this repo's host numpy path if cv2 is unavailable.
    """
    rng = np.random.default_rng(0)
    image_mat = rng.integers(0, 256, (HEIGHT, WIDTH, 3), dtype=np.uint8)

    try:
        import cv2

        def one(seed: int):
            sample_rng = np.random.default_rng(seed)
            mat = cv2.getRotationMatrix2D(
                ((WIDTH - 1) / 2, (HEIGHT - 1) / 2), 17, 1.0
            )
            out = cv2.warpAffine(image_mat, mat, (WIDTH, HEIGHT))
            out = np.clip(out.astype(np.float32) * 1.2 + 30, 0, 255)
            noise = sample_rng.normal(0, 10, out.shape)
            out = np.clip(out + noise, 0, 255).astype(np.uint8)
            ok, enc = cv2.imencode(
                '.jpg', out, [cv2.IMWRITE_JPEG_QUALITY, 60]
            )
            assert ok
            return cv2.imdecode(enc, cv2.IMREAD_COLOR)

    except ImportError:
        from vkit_tpu.element import Image
        from vkit_tpu.mechanism.distortion import (
            brightness_shift,
            gaussion_noise,
            jpeg_quality,
            rotate,
            std_shift,
        )

        image = Image(mat=image_mat)

        def one(seed: int):
            sample_rng = np.random.default_rng(seed)
            out = rotate.distort_image({'angle': 17}, image, rng=sample_rng)
            out = std_shift.distort_image({'scale': 1.2}, out, rng=sample_rng)
            out = brightness_shift.distort_image(
                {'delta': 30}, out, rng=sample_rng
            )
            out = gaussion_noise.distort_image({'std': 10}, out, rng=sample_rng)
            out = jpeg_quality.distort_image({'quality': 60}, out, rng=sample_rng)
            return out

    one(0)  # Warmup.
    count = 16
    start = time.perf_counter()
    for idx in range(count):
        one(idx + 1)
    elapsed = time.perf_counter() - start
    return count / elapsed


def get_cpu_baseline() -> float:
    if CPU_BASELINE_FILE.exists():
        return float(json.loads(CPU_BASELINE_FILE.read_text())['images_per_sec'])
    # Honest CPU number: measure in a subprocess pinned to the CPU backend
    # (otherwise the host path could silently dispatch jnp work to the TPU).
    import subprocess
    import sys
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    out = subprocess.run(
        [sys.executable, __file__, '--measure-cpu'],
        capture_output=True, text=True, env=env, check=True,
    )
    ips = float(out.stdout.strip().splitlines()[-1])
    CPU_BASELINE_FILE.write_text(
        json.dumps({
            'images_per_sec': ips,
            'note': (
                'per-image full distortion chain (rotate + contrast + '
                'brightness + noise + jpeg) @640x640 on CPU via the host '
                'numpy path, algorithmically equivalent to the reference '
                'per-image cv2 pipeline'
            ),
        }, indent=2) + '\n'
    )
    return ips


def measure_tpu() -> float:
    import jax

    from vkit_tpu.parallel import sample_synthesis_params, synthesize_batch

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (BATCH, HEIGHT, WIDTH, 3), dtype=np.uint8)
    images_dev = jax.device_put(jax.numpy.asarray(images))
    params, warp_statics = sample_synthesis_params(
        rng, BATCH, HEIGHT, WIDTH, level=5
    )
    params = jax.device_put(params)
    key = jax.random.PRNGKey(0)

    jnp = jax.numpy

    # The whole timing loop runs as ONE device program (lax.scan): the
    # tunneled backend costs ~28ms per dispatch, which would otherwise
    # dominate.  Each scan step re-runs the full pipeline with a distinct
    # key (not hoistable), and the mean-accumulator forces every step's
    # execution; one scalar fetch at the end synchronizes.
    @jax.jit
    def timed_loop(images, params, key):
        def body(acc, step):
            out = synthesize_batch(
                images, params, jax.random.fold_in(key, step),
                warp_statics=warp_statics, out_shape=(HEIGHT, WIDTH),
            )
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(STEPS))
        return acc

    float(timed_loop(images_dev, params, key))  # Compile + warmup.

    start = time.perf_counter()
    float(timed_loop(images_dev, params, key))
    elapsed = time.perf_counter() - start
    return (STEPS * BATCH) / elapsed


def main():
    cpu_ips = get_cpu_baseline()
    tpu_ips = measure_tpu()
    print(json.dumps({
        'metric': 'full distortion pipeline @640x640',
        'value': round(tpu_ips, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(tpu_ips / cpu_ips, 2),
    }))


if __name__ == '__main__':
    import sys

    if '--measure-cpu' in sys.argv:
        # The axon sitecustomize pre-imports jax with the TPU platform; env
        # vars alone are ignored, so force the backend before first use.
        import jax
        jax.config.update('jax_platforms', 'cpu')
        print(measure_cpu_baseline())
    else:
        main()
