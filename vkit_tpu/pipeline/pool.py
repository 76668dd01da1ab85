"""Pipeline generation pool: retry-on-exception workers over the prefetch
pump.

Capability parity: vkit/pipeline/pool.py:27-124.
"""
import logging
from typing import Generic, Optional, TypeVar

from numpy.random import Generator as RandomGenerator

from ..utility import Pool, PoolConfig
from .interface import Pipeline

logger = logging.getLogger(__name__)

_T_OUTPUT = TypeVar('_T_OUTPUT')


class PipelinePool(Generic[_T_OUTPUT]):

    def __init__(
        self,
        pipeline: Pipeline[_T_OUTPUT],
        inventory: int,
        num_processes: int,
        rng_seed: int,
        num_runs_reset_rng: Optional[int] = None,
        timeout: int = 60,
        use_processes: bool = True,
    ):
        self.pipeline = pipeline
        self.num_runs_reset_rng = num_runs_reset_rng
        self._run_counts = [0] * num_processes

        def worker(worker_idx: int, rng: RandomGenerator, _config) -> _T_OUTPUT:
            # Retry-on-exception with forced rng advance
            # (vkit/pipeline/pool.py:64-92).
            while True:
                cur_rng_state = rng.bit_generator.state
                try:
                    output = pipeline.run(rng)
                    break
                except Exception:
                    logger.exception(
                        f'pipeline.run worker={worker_idx} failed with '
                        f'rng_state={cur_rng_state}, retrying...'
                    )
                    if rng.bit_generator.state == cur_rng_state:
                        rng.random()

            self._run_counts[worker_idx] += 1
            if num_runs_reset_rng \
                    and self._run_counts[worker_idx] % num_runs_reset_rng == 0:
                # Periodic stream reset for replay windows
                # (vkit/pipeline/pool.py:55-62).
                import numpy as np
                rng.bit_generator.state = np.random.default_rng(
                    rng_seed + worker_idx
                ).bit_generator.state
            return output

        # The synthesis pipeline is Python-bound: real processes by default
        # (forked, so the closure worker needs no pickling), matching the
        # reference's multiprocessing pool (vkit/pipeline/pool.py:95-124).
        self.pool: Pool[_T_OUTPUT] = Pool(
            config=PoolConfig(
                inventory=inventory,
                num_processes=num_processes,
                rng_seed=rng_seed,
                timeout=timeout,
                use_processes=use_processes,
            ),
            func=worker,
        )

    def run(self) -> _T_OUTPUT:
        return self.pool.run()

    def cleanup(self):
        self.pool.cleanup()
