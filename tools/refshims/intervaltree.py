"""Minimal intervaltree stand-in (addi + point query + iteration)."""
import bisect
from typing import Any, List, NamedTuple


class Interval(NamedTuple):
    begin: int
    end: int
    data: Any = None


class IntervalTree:

    def __init__(self):
        self._intervals: List[Interval] = []
        self._starts: List[int] = []
        self._sorted = True

    def addi(self, begin, end, data=None):
        self._intervals.append(Interval(begin, end, data))
        self._sorted = False

    def _ensure(self):
        if not self._sorted:
            self._intervals.sort(key=lambda itv: itv.begin)
            self._starts = [itv.begin for itv in self._intervals]
            self._sorted = True

    def __iter__(self):
        self._ensure()
        return iter(self._intervals)

    def __getitem__(self, point):
        self._ensure()
        hits = set()
        idx = bisect.bisect_right(self._starts, point)
        # Intervals are non-overlapping in this usage; scan a small window.
        for itv in self._intervals[max(0, idx - 4):idx]:
            if itv.begin <= point < itv.end:
                hits.add(itv)
        return hits
