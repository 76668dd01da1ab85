"""Native (C++) host kernels, loaded via ctypes.

The reference's host-side hot loops live in native libraries (OpenCV
rasterization/contours, GEOS, Clipper); this package is the first-party
equivalent.  The shared library builds on first import (g++, ~1s) and is
cached next to the source; any failure falls back to the pure-python
implementations in vkit_tpu/geometry/_numpy_impl.py.
"""
import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent / 'geometry.cpp'
_LIB = Path(__file__).resolve().parent / 'libvkitgeom.so'

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            [
                'g++', '-O3', '-march=native', '-ffp-contract=off', '-funroll-loops',
                '-shared', '-fPIC', str(_SRC), '-o', str(_LIB),
            ],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:  # noqa: BLE001
        logger.exception('native geometry build failed; using numpy fallback')
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if stale) and load the geometry library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get('VKIT_TPU_DISABLE_NATIVE'):
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        logger.exception('native geometry load failed; using numpy fallback')
        return None

    lib.vg_fill_poly.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vg_fill_poly.restype = None
    lib.vg_label8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vg_label8.restype = ctypes.c_int
    lib.vg_trace_boundary.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
    ]
    lib.vg_trace_boundary.restype = ctypes.c_int
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.vg_remap_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p,
    ]
    lib.vg_remap_f32.restype = None
    lib.vg_resize_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, f32p, ctypes.c_int, ctypes.c_int,
        i32p, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p,
    ]
    lib.vg_resize_f32.restype = None
    f64p = ctypes.POINTER(ctypes.c_double)
    if hasattr(lib, 'vg_lattice_node_maps'):
        lib.vg_lattice_node_maps.argtypes = [
            f64p, f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, ctypes.c_int, i32p, ctypes.c_int,
            f32p, f32p, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vg_lattice_node_maps.restype = None
    if hasattr(lib, 'vg_cell_mats'):
        lib.vg_cell_mats.argtypes = [
            f64p, f64p, ctypes.c_int,
            f64p, f64p, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vg_cell_mats.restype = None
    if hasattr(lib, 'vg_repair_backward_maps'):
        lib.vg_repair_backward_maps.argtypes = [
            f64p, f64p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.vg_repair_backward_maps.restype = None

    _lib = lib
    return lib
