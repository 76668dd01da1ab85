"""rectpack shim: the newPacker subset the reference's text-region
stacker uses (vkit/pipeline/text_detection/page_text_region.py:756-784)
— shelf packing, no rotation, single bin."""


class _Packer:

    def __init__(self, rotation: bool = False):
        self._rects = []
        self._bins = []
        self._placed = []

    def add_rect(self, width: int, height: int, rid=None):
        self._rects.append((int(width), int(height), rid))

    def add_bin(self, width: int, height: int):
        self._bins.append((int(width), int(height)))

    def pack(self):
        self._placed = []
        if not self._bins:
            return
        bin_w, bin_h = self._bins[0]
        # Shelf next-fit, tallest first (rectpack's default heuristic
        # family; exact placement parity is not required here — the
        # consumer only needs a valid non-overlapping packing).
        order = sorted(range(len(self._rects)),
                       key=lambda i: -self._rects[i][1])
        x = y = shelf_h = 0
        for i in order:
            w, h, rid = self._rects[i]
            if w > bin_w or h > bin_h:
                continue
            if x + w > bin_w:
                y += shelf_h
                x = 0
                shelf_h = 0
            if y + h > bin_h:
                continue
            self._placed.append((0, x, y, w, h, rid))
            x += w
            shelf_h = max(shelf_h, h)

    def rect_list(self):
        return list(self._placed)


def newPacker(rotation: bool = False, **kwargs):
    return _Packer(rotation=rotation)
