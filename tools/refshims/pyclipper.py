"""Minimal pyclipper stand-in: PyclipperOffset over the first-party
EDT-based polygon offset (vkit_tpu.geometry)."""
import numpy as np

JT_ROUND = 0
JT_SQUARE = 1
JT_MITER = 2
ET_CLOSEDPOLYGON = 0


class PyclipperOffset:

    def __init__(self):
        self._paths = []

    def AddPath(self, path, join_type=JT_ROUND, end_type=ET_CLOSEDPOLYGON):
        self._paths.append(np.asarray(path, dtype=np.float64))

    def Execute(self, delta):
        from vkit_tpu import geometry
        out = []
        for path in self._paths:
            for piece in geometry.offset_polygon(path, float(delta)):
                arr = np.round(np.asarray(piece)).astype(np.int64)
                out.append([(int(x), int(y)) for x, y in arr])
        # Largest first, like clipper's Execute()[0] convention.
        out.sort(key=lambda ring: -abs(_ring_area(ring)))
        return out


def _ring_area(ring):
    arr = np.asarray(ring, dtype=np.float64)
    x, y = arr[:, 0], arr[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
