"""Measure the ACTUAL reference (vkit @ /root/reference) on this host.

The reference's engine/pipeline layers need external assets (fonts, image
datasets, corpora) that this environment does not ship, so the end-to-end
17-step pipeline cannot run here.  What CAN run — via the pure-Python shims
in tools/refshims (shapely/pyclipper/cattrs/iolite/intervaltree, backed by
vkit_tpu.geometry) — is the north-star workload itself: the full
RandomDistortion pipeline (policy sampling + photometric + geometric +
trim) co-transforming a 640x640 page image, active mask, score map, and
polygon/point labels.

Usage:
    python tools/measure_reference.py [--num-seeds 16] [--side 640]

Writes BASELINE_REF.json and prints a summary.
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

sys.path.insert(0, str(REPO / 'tools' / 'refshims'))
sys.path.insert(0, '/root/reference')
sys.path.insert(0, str(REPO))

import os
os.environ.setdefault('DISABLE_VKIT_COLLECT_USAGE_INFORMATION', '1')

import numpy as np  # noqa: E402

# cv2 >= 5 rejects read-only arrays as draw targets; the pinned-era cv2 the
# reference was built against tolerated them (it draws into frozen Mask
# mats and re-assigns the returned array).  Shim a writable copy.
import cv2  # noqa: E402

_orig_cv_ellipse = cv2.ellipse


def _ellipse_compat(img, *args, **kwargs):
    if isinstance(img, np.ndarray) and not img.flags.writeable:
        img = img.copy()
    return _orig_cv_ellipse(img, *args, **kwargs)


cv2.ellipse = _ellipse_compat


def build_sample(side: int, rng):
    """Synthetic page + labels shaped like the text-detection pipeline's."""
    from vkit.element import Image, Mask, Point, PointList, Polygon, ScoreMap

    image = Image(mat=rng.integers(0, 256, (side, side, 3), dtype=np.uint8))
    mask = Mask.from_shape((side, side), value=1)

    score_map = ScoreMap(
        mat=rng.random((side, side), dtype=np.float64).astype(np.float32)
    )

    polygons = []
    points = PointList()
    cell = side // 8
    for row in range(8):
        for col in range(8):
            up = row * cell + 4
            left = col * cell + 4
            polygons.append(Polygon.from_xy_pairs([
                (left, up), (left + cell - 8, up),
                (left + cell - 8, up + cell // 2), (left, up + cell // 2),
            ]))
            points.append(Point.create(y=up, x=left))
    return image, mask, score_map, polygons, points


def measure_reference_random_distortion(num_seeds: int, side: int):
    from vkit.mechanism.distortion_policy.random_distortion import (
        random_distortion_factory,
    )

    random_distortion = random_distortion_factory.create({
        # Same default the TPU pipeline uses.
        'disabled_policy_names': ['defocus_blur', 'zoom_in_blur'],
    })

    # Warm up caches / imports with one run.
    rng = np.random.default_rng(0)
    sample = build_sample(side, rng)
    random_distortion.distort(
        rng=rng, image=sample[0], mask=sample[1], score_map=sample[2],
        polygons=sample[3], points=sample[4],
    )

    begin = time.perf_counter()
    for seed in range(1, num_seeds + 1):
        rng = np.random.default_rng(seed)
        image, mask, score_map, polygons, points = build_sample(side, rng)
        result = random_distortion.distort(
            rng=rng, image=image, mask=mask, score_map=score_map,
            polygons=polygons, points=points,
        )
        assert result.image is not None
    elapsed = time.perf_counter() - begin
    return num_seeds / elapsed, elapsed


def measure_reference_fixed_chain(num_iters: int, side: int):
    """The reference running the bench.py fixed chain (config 1+2 proxy):
    affine warp + contrast + brightness + gaussian noise + jpeg + resize."""
    import cv2

    from vkit.element import Image
    from vkit.mechanism import distortion as ref_distortion

    rng = np.random.default_rng(0)
    mat = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)

    def one(mat):
        image = Image(mat=mat)
        image = ref_distortion.rotate.distort_image({'angle': 17}, image)
        image = ref_distortion.std_shift.distort_image({'scale': 1.2}, image)
        image = ref_distortion.brightness_shift.distort_image(
            {'delta': 20}, image
        )
        image = ref_distortion.gaussion_noise.distort_image(
            {'std': 8}, image, rng=np.random.default_rng(1)
        )
        image = ref_distortion.jpeg_quality.distort_image({'quality': 40}, image)
        resized = cv2.resize(image.mat, (side, side), interpolation=cv2.INTER_AREA)
        return resized

    one(mat)  # Warm up.
    begin = time.perf_counter()
    for _ in range(num_iters):
        out = one(mat)
    elapsed = time.perf_counter() - begin
    assert out is not None
    return num_iters / elapsed, elapsed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--num-seeds', type=int, default=16)
    parser.add_argument('--side', type=int, default=640)
    args = parser.parse_args()

    import multiprocessing
    print(f'host cores: {multiprocessing.cpu_count()}')

    chain_rate, chain_secs = measure_reference_fixed_chain(
        max(4, args.num_seeds // 2), args.side
    )
    print(f'reference fixed distortion chain @{args.side}: '
          f'{chain_rate:.2f} samples/sec ({chain_secs:.1f}s)')

    rd_rate, rd_secs = measure_reference_random_distortion(
        args.num_seeds, args.side
    )
    print(f'reference RandomDistortion pipeline @{args.side}: '
          f'{rd_rate:.2f} samples/sec ({rd_secs:.1f}s, {args.num_seeds} seeds)')

    payload = {
        'host_cores': multiprocessing.cpu_count(),
        'side': args.side,
        'reference_fixed_chain_samples_per_sec': round(chain_rate, 4),
        'reference_random_distortion_samples_per_sec': round(rd_rate, 4),
        'num_seeds': args.num_seeds,
        'notes': (
            'Measured on /root/reference via tools/refshims '
            '(shapely/pyclipper/cattrs/iolite/intervaltree shims backed by '
            'vkit_tpu.geometry). The 17-step pipeline needs font/image/'
            'corpus assets absent from this environment; the RandomDistortion '
            'number IS the north-star "full distortion pipeline" workload '
            '(policy sampling + photometric + geometric + label co-transform '
            '+ trim) on one host core.'
        ),
    }
    (REPO / 'BASELINE_REF.json').write_text(json.dumps(payload, indent=2))
    print('wrote BASELINE_REF.json')


if __name__ == '__main__':
    main()
