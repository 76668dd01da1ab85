"""Two-pass MXU warp + Pallas row-shift kernel (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vkit_tpu.ops.pallas_kernels import row_shift_auto
from vkit_tpu.ops.warp import warp_affine_np
from vkit_tpu.ops.warp_mxu import warp_affine_batch_mxu


def test_row_shift():
    rng = np.random.default_rng(0)
    b, l, m, ow = 3, 256, 1536, 400
    x = jnp.asarray(rng.random((b, l, m), dtype=np.float32))
    starts = jnp.asarray(rng.integers(0, m - 1024, (b, l)), dtype=np.int32)
    out = np.asarray(row_shift_auto(x, starts, ow))
    j = np.arange(ow)
    ref = np.take_along_axis(
        np.asarray(x), np.asarray(starts)[:, :, None] + j[None, None, :], axis=2
    )
    assert np.array_equal(out, ref)


def _fwd_mat(h, w, angle_deg, scale=1.0, tx=0.0, ty=0.0, shear=0.0):
    th = np.radians(angle_deg)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    rot = np.array([
        [np.cos(th), -np.sin(th)],
        [np.sin(th), np.cos(th)],
    ]) * scale
    sh = np.array([[1.0, np.tan(np.radians(shear))], [0.0, 1.0]])
    lin = rot @ sh
    m = np.eye(3)
    m[:2, :2] = lin
    m[0, 2] = cx - lin[0, 0] * cx - lin[0, 1] * cy + tx
    m[1, 2] = cy - lin[1, 0] * cx - lin[1, 1] * cy + ty
    return m


@pytest.fixture(scope='module')
def smooth_image():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    return gaussian_filter(
        rng.random((96, 96, 3)) * 255, sigma=2
    ).astype(np.float32)


def test_axis_aligned_exact(smooth_image):
    """Translate / scale: the decomposition IS direct bilinear."""
    h, w = smooth_image.shape[:2]
    mats = np.stack([
        _fwd_mat(h, w, 0),
        _fwd_mat(h, w, 0, tx=3.25, ty=-7.5),
        _fwd_mat(h, w, 0, scale=1.15),
    ])
    imgs = jnp.asarray(np.stack([smooth_image] * 3))
    out = np.asarray(warp_affine_batch_mxu(imgs, mats))
    for i in range(3):
        ref = warp_affine_np(smooth_image, mats[i], (h, w))
        assert np.abs(out[i] - ref).max() < 1e-3


def test_rotation_close(smooth_image):
    """Rotation/shear: sheared-footprint filter, interior within 1 LSB."""
    from vkit_tpu.ops.warp import affine_maps_np

    h, w = smooth_image.shape[:2]
    mats = np.stack([
        _fwd_mat(h, w, 17),
        _fwd_mat(h, w, -23, scale=0.9, shear=10, tx=5),
    ])
    imgs = jnp.asarray(np.stack([smooth_image] * 2))
    out = np.asarray(warp_affine_batch_mxu(imgs, mats))
    for i in range(2):
        ref = warp_affine_np(smooth_image, mats[i], (h, w))
        my, mx = affine_maps_np(mats[i], (h, w))
        interior = (my > 1) & (my < h - 2) & (mx > 1) & (mx < w - 2)
        diff = np.abs(out[i] - ref)
        assert diff[interior].max() < 1.0
        assert diff.mean() < 0.5


def test_uint8_roundtrip(smooth_image):
    h, w = smooth_image.shape[:2]
    mats = _fwd_mat(h, w, 9)[None]
    imgs = jnp.asarray(smooth_image.astype(np.uint8)[None])
    out = warp_affine_batch_mxu(imgs, mats)
    assert out.dtype == jnp.uint8
    assert out.shape == imgs.shape


def test_area_resize_upscale_matches_cv2():
    cv2 = pytest.importorskip('cv2')
    from vkit_tpu.ops.resize_taps import Interpolation, resize_np

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    for dsize in ((80, 100), (57, 73), (41, 51)):
        mine = resize_np(img, dsize, Interpolation.AREA)
        ref = cv2.resize(img, (dsize[1], dsize[0]), interpolation=cv2.INTER_AREA)
        assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 1


def test_row_shift_smem_chunking():
    """Batches whose (B, L) starts array exceeds the SMEM prefetch budget
    must chunk along B (region flatten stacks thousands of rows — the
    unchunked call failed server-side with 'would exceed memory
    (space=smem)' on v5e).  Chunked output must equal the per-row gather."""
    from vkit_tpu.ops.pallas_kernels import (
        _SMEM_STARTS_ELEMS,
        _b_chunks,
        row_shift_window_slab,
    )

    rng = np.random.default_rng(1)
    b, l, c, iw, ow = 600, 128, 2, 300, 256
    assert b * l > _SMEM_STARTS_ELEMS  # would have overflowed SMEM
    assert len(_b_chunks(b, l)) > 1
    x = jnp.asarray(rng.random((b, l, c, iw), dtype=np.float32))
    starts = rng.integers(-40, 200, (b, l))
    out = np.asarray(row_shift_window_slab(
        x, jnp.asarray(starts, jnp.int32), ow, border_value=0.5
    ))
    xs = np.asarray(x)
    for bi in (0, 109, 599):  # rows spanning several chunks
        for li in (0, 63, 127):
            s = int(starts[bi, li])
            ref = np.full((c, ow), 0.5, np.float32)
            lo, hi = max(s, 0), min(s + ow, iw)
            if hi > lo:
                ref[:, lo - s:hi - s] = xs[bi, li, :, lo:hi]
            assert np.array_equal(out[bi, li], ref), (bi, li)
