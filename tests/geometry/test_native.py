"""Native C++ geometry vs the pure-python reference implementation."""
import numpy as np
import pytest

import vkit_tpu.geometry as geometry
pyimpl = geometry.pure  # pure-python snapshot (module names are rebound to native)

native = pytest.importorskip(
    'vkit_tpu.geometry._native', reason='native geometry library not built'
)


def test_has_native():
    assert geometry.HAS_NATIVE


def test_fill_poly_bit_exact():
    rng = np.random.default_rng(0)
    for _ in range(150):
        n = int(rng.integers(3, 9))
        pts = rng.uniform(-10, 70, (n, 2))
        a = pyimpl.fill_poly(pts, (64, 64))
        b = native.fill_poly(pts, (64, 64))
        assert np.array_equal(a, b)


def test_fill_poly_degenerate():
    assert native.fill_poly(np.zeros((1, 2)), (8, 8)).sum() == 0
    line = native.fill_poly(np.array([[1.0, 1.0], [6.0, 1.0]]), (8, 8))
    assert np.array_equal(line, pyimpl.fill_poly(np.array([[1.0, 1.0], [6.0, 1.0]]), (8, 8)))


def test_external_contours_bit_exact():
    rng = np.random.default_rng(1)
    for _ in range(50):
        mask = (rng.random((40, 40)) < 0.35).astype(np.uint8)
        a = pyimpl.external_contours(mask)
        b = native.external_contours(mask)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_disconnected_components_bit_exact():
    rng = np.random.default_rng(2)
    mask = (rng.random((32, 32)) < 0.3).astype(np.uint8)
    a = pyimpl.disconnected_components(mask)
    b = native.disconnected_components(mask)
    assert len(a) == len(b)
    for (ca, ma), (cb, mb) in zip(a, b):
        assert np.array_equal(ca, cb)
        assert np.array_equal(ma, mb)
