"""Which photometric programs compile NEW cache keys per batch?

Runs the config-5 photometric stage repeatedly and prints every new
(name, static, mode) key in _COMPILED_FNS after the first batch — each
one is a steady-state compile leak (VERDICT r4 item 1).
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402

from vkit_tpu.mechanism import batched  # noqa: E402
from vkit_tpu.mechanism.batched_random import (  # noqa: E402
    batch_random_photometric_distort,
)

SIDE = 640
batch = 32
rng = np.random.default_rng(4)
images = jnp.asarray(
    rng.integers(0, 256, (batch, SIDE, SIDE, 3), dtype=np.uint8)
)
key = jax.random.PRNGKey(0)

seen = set()
for i in range(10):
    batch_random_photometric_distort(images, 5, rng, key=key)
    new = set(batched._COMPILED_FNS) - seen
    seen |= set(new)
    label = 'WARMUP' if i == 0 else 'LEAK'
    print(f'[batch {i}] new keys: {len(new)}')
    for k in sorted(new, key=repr):
        print(f'   {label}: {k}')
print(f'total keys: {len(seen)}')
