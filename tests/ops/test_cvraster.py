"""cv2-oracle tests for the integer rasterization primitives.

cv2 is the TEST ORACLE only (never a runtime dependency): every check
draws the same primitive through ops/cvraster.py and cv2 and compares
pixel sets.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from vkit_tpu.ops import cvraster as R  # noqa: E402

S = 1 << 16


def test_circle_fill_matches_cv2():
    rng = np.random.default_rng(0)
    for _ in range(60):
        c = tuple(int(v) for v in rng.integers(-10, 130, 2))
        r = int(rng.integers(0, 40))
        a = np.zeros((120, 120), np.uint8)
        b = np.zeros((120, 120), np.uint8)
        cv2.circle(a, c, r, 1, -1)
        R.circle_fill(b, c, r)
        assert np.array_equal(a, b), (c, r)


def test_line_int_matches_cv2_thickness1():
    rng = np.random.default_rng(1)
    for _ in range(120):
        p = rng.integers(-80 * S, 300 * S, 4).astype(np.int64)
        a = np.zeros((240, 240), np.uint8)
        b = np.zeros((240, 240), np.uint8)
        cv2.line(a, (int(p[0]), int(p[1])), (int(p[2]), int(p[3])),
                 1, 1, 8, shift=16)
        R.line_int(b, (int(p[0]), int(p[1])), (int(p[2]), int(p[3])))
        assert np.array_equal(a, b), p


def test_line2_matches_cv2_inbounds():
    # shift=15 with halved coords routes cv2 to the subpixel Line2 walker.
    rng = np.random.default_rng(2)
    for _ in range(120):
        p = (rng.integers(1 * S, 110 * S, 4) // 2 * 2).astype(np.int64)
        a = np.zeros((120, 120), np.uint8)
        b = np.zeros((120, 120), np.uint8)
        cv2.line(a, (int(p[0] // 2), int(p[1] // 2)),
                 (int(p[2] // 2), int(p[3] // 2)), 1, 1, 8, shift=15)
        R.line2(b, (int(p[0]), int(p[1])), (int(p[2]), int(p[3])))
        assert np.array_equal(a, b), p


def test_ellipse_thickness1_bit_exact():
    rng = np.random.default_rng(3)
    for _ in range(60):
        c = tuple(int(v) for v in rng.integers(30, 90, 2))
        axes = tuple(int(v) for v in rng.integers(1, 60, 2))
        a = np.zeros((120, 120), np.uint8)
        b = np.zeros((120, 120), np.uint8)
        cv2.ellipse(a, c, axes, 0, 0, 360, 1, 1)
        R.draw_ellipse(b, c, axes, 1)
        assert np.array_equal(a, b), (c, axes)


def test_ellipse_thick_boundary_bounded():
    # Thickness >= 2: cv's convex-poly scan differs on boundary pixels
    # only; bound the divergence (< 8% of the drawn ring set per draw).
    rng = np.random.default_rng(4)
    for t in (2, 3):
        for _ in range(25):
            c = tuple(int(v) for v in rng.integers(40, 80, 2))
            axes = tuple(int(v) for v in rng.integers(4, 50, 2))
            a = np.zeros((120, 120), np.uint8)
            b = np.zeros((120, 120), np.uint8)
            cv2.ellipse(a, c, axes, 0, 0, 360, 1, t)
            R.draw_ellipse(b, c, axes, t)
            diff = int((a != b).sum())
            assert diff <= max(0.10 * float(a.sum()), 8), (c, axes, t, diff)
