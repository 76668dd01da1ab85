"""Batched RandomDistortion: policy sampling on host, gated device apply.

The per-element RandomDistortion threads one image through a sampled
sequence of distortions (distortion_policy/random_distortion.py).  Here the
SAME stage sampler runs per batch element on the host (numpy rng, same
weights/conflict groups/retries), and the device applies each round as
full-batch catalog programs gated per sample:

  round r:  for each distortion name drawn by >=1 sample,
            out = where(sample drew it, batched_apply(out), out)

All samples share one traced program per (round, name) — no per-sample
Python on the device path.  Photometric only (the geometric stage changes
canvas shapes per sample; use parallel.synthesize_batch or
batched_grid_warp for batched geometry).
"""
import zlib
from collections import defaultdict
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from numpy.random import Generator as RandomGenerator

from .batched import _per_sample, batch_distort_images
from .distortion_policy.random_distortion import (
    RandomDistortionStage,
    RandomDistortionStageConfig,
)

# Shape-changing params must be shared across a batched apply; for these
# names each selected sample gets its own gated full-batch apply.
_PER_SAMPLE_ONLY = ('pixelation', 'zoom_in_blur')


def _gate(original, distorted, selected):
    sel = _per_sample(selected.astype(np.float32))
    out = distorted.astype(jnp.float32) * sel \
        + original.astype(jnp.float32) * (1.0 - sel)
    return jnp.round(out).astype(jnp.uint8)


def batch_random_photometric_distort(
    images,
    level: int,
    rng: RandomGenerator,
    key=None,
    stage_config: Optional[RandomDistortionStageConfig] = None,
):
    """Apply a randomized photometric policy draw to each batch sample.

    ``images``: (N, H, W, 3) uint8 on device.  Returns the distorted batch.
    Policy weights / conflict groups / counts default to the photometric
    stage of random_distortion_factory.
    """
    if stage_config is None:
        from .distortion_policy.random_distortion import (
            random_distortion_factory,
        )
        stage_config = random_distortion_factory.create_photometric_stage_config()
    stage = RandomDistortionStage(stage_config)

    n, height, width = images.shape[:3]
    if key is None:
        key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))

    # Host: per-sample policy sequences + configs (same rng discipline as
    # the per-element path).
    sequences = []
    for _ in range(n):
        policies = ()
        if rng.random() <= stage_config.prob_enable:
            policies = stage.sample_distortion_policies(rng)
        seq = [
            (policy.name, policy.sample_config(level, (height, width), rng))
            for policy in policies
        ]
        sequences.append(seq)

    max_rounds = max((len(seq) for seq in sequences), default=0)
    out = images
    for round_idx in range(max_rounds):
        name_to_members = defaultdict(list)
        for sample_idx, seq in enumerate(sequences):
            if round_idx < len(seq):
                name, config = seq[round_idx]
                name_to_members[name].append((sample_idx, config))

        for name, members in sorted(name_to_members.items()):
            key = jax.random.fold_in(key, zlib.crc32(name.encode()))
            if name in _PER_SAMPLE_ONLY:
                groups = [[m] for m in members]
            else:
                groups = [members]
            for group in groups:
                selected = np.zeros(n, dtype=bool)
                configs = [group[0][1]] * n
                for sample_idx, config in group:
                    selected[sample_idx] = True
                    configs[sample_idx] = config
                distorted = batch_distort_images(name, configs, out, key)
                out = _gate(out, distorted, selected)
    return out
