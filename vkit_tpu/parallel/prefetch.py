"""Host->device prefetch pump.

Replaces the reference's multiprocessing inventory pool (vkit/utility/
pool.py:101-218: workers pickle samples over pipes; backpressure via an
inventory target).  Here host threads produce numpy batches, a pump thread
``jax.device_put``s them ahead of consumption (optionally sharded over the
mesh), and a bounded queue provides the same backpressure with zero
serialization.
"""
import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Iterate device-resident batches, staying ``depth`` batches ahead."""

    _SENTINEL = object()

    def __init__(
        self,
        batch_iterator: Iterator,
        sharding=None,
        depth: int = 2,
    ):
        self.batch_iterator = batch_iterator
        self.sharding = sharding
        self.queue: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self.error: Optional[BaseException] = None
        self.stopped = False
        self.thread = threading.Thread(target=self._pump, daemon=True)
        self.thread.start()

    def _pump(self):
        try:
            for batch in self.batch_iterator:
                if self.stopped:
                    return
                if self.sharding is not None:
                    batch = jax.device_put(batch, self.sharding)
                else:
                    batch = jax.device_put(batch)
                self.queue.put(batch)
        except BaseException as exc:  # Surface worker errors to the consumer.
            self.error = exc
        finally:
            self.queue.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.queue.get()
        if item is self._SENTINEL:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item

    def stop(self):
        self.stopped = True
        # Drain so the pump thread unblocks and exits.
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass


def prefetch_map(
    produce_batch: Callable[[int], object],
    num_batches: int,
    sharding=None,
    depth: int = 2,
) -> DevicePrefetcher:
    """Prefetch ``produce_batch(idx)`` for idx in range(num_batches)."""
    return DevicePrefetcher(
        (produce_batch(idx) for idx in range(num_batches)),
        sharding=sharding,
        depth=depth,
    )
