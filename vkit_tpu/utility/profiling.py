"""Step-level timing + device trace capture.

The reference ships no tracing (SURVEY.md §5: only an uninstrumented
profile_* test hook).  Here: a lightweight step timer the pipeline/driver
can wrap around stages, and a context manager for jax profiler traces
(viewable in XProf/TensorBoard).
"""
import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class StepTimer:
    """Accumulates wall-clock per named stage; cheap enough to leave on."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.totals[name] += elapsed
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                'total_sec': round(self.totals[name], 4),
                'count': self.counts[name],
                'mean_ms': round(self.totals[name] / self.counts[name] * 1e3, 3),
            }
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        }

    def log_summary(self, header: str = 'step timings'):
        logger.info('%s: %s', header, json.dumps(self.summary()))

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True):
    """jax profiler trace context (XProf); no-op when disabled."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
