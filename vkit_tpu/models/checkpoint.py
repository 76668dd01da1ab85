"""Checkpoint / resume for training state (orbax-backed).

The reference has no long-running-state checkpointing at all — only rng
reproducibility capture (SURVEY.md §5; vkit/pipeline/interface.py:227-231).
This module adds the piece a real training deployment needs: atomic,
versioned save/restore of the TrainState pytree plus the data-stream
position, so a preempted run resumes exactly.
"""
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from .train import TrainState

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # noqa: BLE001
    _HAS_ORBAX = False


class CheckpointManager:
    """Save/restore TrainState + metadata under ``directory/step_<N>``.

    Uses orbax's PyTreeCheckpointer when available; otherwise a plain
    npz-of-leaves fallback (same layout metadata, no async)."""

    def __init__(self, directory, max_to_keep: int = 3):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        if _HAS_ORBAX:
            self._ckptr = ocp.PyTreeCheckpointer()

    def _step_dir(self, step: int) -> Path:
        return self.directory / f'step_{step:08d}'

    def all_steps(self):
        # In-progress *.tmp directories are invisible until renamed.
        return sorted(
            int(p.name.split('_')[1])
            for p in self.directory.glob('step_*')
            if p.is_dir() and not p.name.endswith('.tmp')
        )

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, state: TrainState, metadata: Optional[dict] = None):
        # Stage into step_N.tmp and os.replace() once complete, so a crash
        # mid-save can never surface a half-written checkpoint.
        step = int(state.step)
        final_path = self._step_dir(step)
        tmp_path = final_path.with_suffix('.tmp')
        if tmp_path.exists():
            import shutil
            shutil.rmtree(tmp_path)
        tmp_path.mkdir(parents=True, exist_ok=True)

        if _HAS_ORBAX:
            self._ckptr.save((tmp_path / 'state').resolve(), state, force=True)
        else:
            leaves, _ = jax.tree_util.tree_flatten(state)
            # Sharded jax.Arrays gather to host here (fully addressable).
            np.savez(
                tmp_path / 'state.npz',
                **{f'leaf_{i}': np.asarray(x) for i, x in enumerate(leaves)},
            )
        (tmp_path / 'metadata.json').write_text(
            json.dumps({'step': step, **(metadata or {})})
        )

        if final_path.exists():
            import shutil
            shutil.rmtree(final_path)
        import os
        os.replace(tmp_path, final_path)
        self._gc()

    def restore(self, example_state: TrainState, step: Optional[int] = None) -> TrainState:
        if step is None:
            step = self.latest_step()
        assert step is not None, 'no checkpoints found'
        path = self._step_dir(step)
        if _HAS_ORBAX:
            return self._ckptr.restore(
                (path / 'state').resolve(), item=example_state
            )
        data = np.load(path / 'state.npz')
        leaves, treedef = jax.tree_util.tree_flatten(example_state)
        restored = []
        for i, example in enumerate(leaves):
            value = data[f'leaf_{i}']
            if isinstance(example, jax.Array) and hasattr(example, 'sharding'):
                # Re-shard to match the example's placement (tp/dp meshes).
                value = jax.device_put(value, example.sharding)
            restored.append(value)
        return jax.tree_util.tree_unflatten(treedef, restored)

    def read_metadata(self, step: Optional[int] = None) -> Any:
        if step is None:
            step = self.latest_step()
        return json.loads((self._step_dir(step) / 'metadata.json').read_text())

    def _gc(self):
        steps = self.all_steps()
        import shutil
        for step in steps[:-self.max_to_keep]:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)
