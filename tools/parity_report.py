"""Generate PARITY.md: measured fidelity vs the OpenCV oracle.

The reference's computational core is OpenCV; these measurements quantify
the BASELINE.json fidelity target (pixel MAE < 1 LSB) per op family.
Run: JAX_PLATFORMS=cpu python tools/parity_report.py
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import cv2  # noqa: E402  (test oracle only)

rng = np.random.default_rng(0)
IMG = rng.integers(0, 256, (160, 200, 3), dtype=np.uint8)
GRAY = rng.integers(0, 256, (160, 200), dtype=np.uint8)

rows = []


def add(family, case, mae, max_err, note=''):
    rows.append((family, case, mae, max_err, note))


def stats(a, b):
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    return d.mean(), d.max()


# --- resize -----------------------------------------------------------------
from vkit_tpu.ops.resize_taps import Interpolation, resize_np  # noqa: E402

cv_flags = {
    Interpolation.NEAREST: cv2.INTER_NEAREST,
    Interpolation.LINEAR: cv2.INTER_LINEAR,
    Interpolation.CUBIC: cv2.INTER_CUBIC,
    Interpolation.AREA: cv2.INTER_AREA,
    Interpolation.LANCZOS4: cv2.INTER_LANCZOS4,
}
for interp, flag in cv_flags.items():
    for dsize in ((80, 120), (320, 400)):
        mine = resize_np(IMG, dsize, interp)
        ref = cv2.resize(IMG, (dsize[1], dsize[0]), interpolation=flag)
        mae, mx = stats(mine, ref)
        add('resize', f'{interp.value} {IMG.shape[:2]}->{dsize}', mae, mx)

# --- affine warp ------------------------------------------------------------
from vkit_tpu.ops.warp import warp_affine_np  # noqa: E402

mat = cv2.getRotationMatrix2D((99.5, 79.5), 23, 1.1)
mine = warp_affine_np(IMG, mat, IMG.shape[:2])
ref = cv2.warpAffine(IMG, mat, (IMG.shape[1], IMG.shape[0]))
mae, mx = stats(mine, ref)
add('warpAffine', 'rotate 23deg scale 1.1', mae, mx)

# --- colorspace -------------------------------------------------------------
from vkit_tpu.ops.colorspace_np import (  # noqa: E402
    rgb_to_gray,
    rgb_to_hsv_full,
)

mine = rgb_to_gray(IMG)
ref = cv2.cvtColor(IMG, cv2.COLOR_RGB2GRAY)
add('cvtColor', 'RGB->GRAY', *stats(mine, ref))
mine = rgb_to_hsv_full(IMG)
ref = cv2.cvtColor(IMG, cv2.COLOR_RGB2HSV_FULL)
# Hue is cyclic mod 256: compare on the circle.
dh = np.abs(mine[..., 0].astype(int) - ref[..., 0].astype(int))
dh = np.minimum(dh, 256 - dh)
dsv = np.abs(mine[..., 1:].astype(int) - ref[..., 1:].astype(int))
add('cvtColor', 'RGB->HSV_FULL',
    (dh.sum() + dsv.sum()) / mine.size, max(dh.max(), dsv.max()),
    'hue compared cyclically')

# --- blur -------------------------------------------------------------------
from vkit_tpu.ops.blur import gaussian_blur_np  # noqa: E402

mine = gaussian_blur_np(IMG, 1.5, 9)
ref = cv2.GaussianBlur(IMG, (9, 9), 1.5)
add('GaussianBlur', 'sigma 1.5 k9', *stats(mine, ref))

# --- jpeg sim ---------------------------------------------------------------
from vkit_tpu.ops.effect import jpeg_quality_np  # noqa: E402

for q in (90, 60, 30):
    mine = jpeg_quality_np(IMG, q)
    ok, enc = cv2.imencode(
        '.jpg', cv2.cvtColor(IMG, cv2.COLOR_RGB2BGR),
        [cv2.IMWRITE_JPEG_QUALITY, q],
    )
    ref = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    mae, mx = stats(mine, ref)
    add('jpeg sim', f'quality {q}', mae, mx,
        'vs real libjpeg roundtrip (both lossy)')

# --- fill_poly --------------------------------------------------------------
import vkit_tpu.geometry as geometry  # noqa: E402

diff_px = 0
total_on = 0
for _ in range(100):
    pts = rng.uniform(0, 64, (5, 2))
    mine = geometry.fill_poly(pts, (64, 64))
    ref = np.zeros((64, 64), np.uint8)
    cv2.fillPoly(ref, [np.round(pts).astype(np.int32)], 1)
    diff_px += int((mine != ref).sum())
    total_on += int(ref.sum())
add('fillPoly', '100 random pentagons', diff_px / total_on, 1,
    f'boundary-only diffs: {diff_px} px of {total_on} ({geometry.HAS_NATIVE=})')

# --- MXU warp vs direct bilinear ---------------------------------------------
from scipy.ndimage import gaussian_filter  # noqa: E402

from vkit_tpu.ops.warp_mxu import warp_affine_batch_mxu  # noqa: E402
import jax.numpy as jnp  # noqa: E402

smooth = gaussian_filter(rng.random((96, 96, 3)) * 255, sigma=2).astype(np.float32)
m = np.eye(3)
th = np.radians(17)
m[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
m[0, 2], m[1, 2] = 20, -5
out = np.asarray(warp_affine_batch_mxu(jnp.asarray(smooth[None]), m[None]))[0]
ref = warp_affine_np(smooth, m, (96, 96))
from vkit_tpu.ops.warp import affine_maps_np  # noqa: E402

my_map, mx_map = affine_maps_np(m, (96, 96))
interior = (my_map > 1) & (my_map < 94) & (mx_map > 1) & (mx_map < 94)
d = np.abs(out - ref).max(axis=-1)
add('MXU 2-pass warp', 'rotate 17deg + shift (interior)',
    d[interior].mean(), d[interior].max(), 'vs direct bilinear')

# --- write ------------------------------------------------------------------
lines = [
    '# PARITY — measured fidelity vs the OpenCV oracle',
    '',
    'Generated by `tools/parity_report.py` (cv2 used as test oracle only; the',
    'data path is cv2-free). Units: uint8 LSBs. Target: MAE < 1 LSB',
    '(BASELINE.json).',
    '',
    '| Family | Case | MAE | max | note |',
    '|---|---|---|---|---|',
]
for family, case, mae, mx, *note in rows:
    note_s = note[0] if note else ''
    lines.append(f'| {family} | {case} | {mae:.4f} | {mx:.1f} | {note_s} |')
lines += [
    '',
    'Full sweeps live in the test suite: `tests/ops/test_ops_parity.py`,',
    '`tests/ops/test_warp_mxu.py`, `tests/ops/test_dense_warp.py`,',
    '`tests/geometry/test_native.py`, `tests/mechanism/test_batched.py`,',
    '`tests/element/` (cv2 parity), `tests/engine/test_qr_encode.py`',
    '(cv2 decoder oracle).',
]
(REPO / 'PARITY.md').write_text('\n'.join(lines) + '\n')
print('\n'.join(lines))
