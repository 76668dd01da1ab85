"""Pre-flight program-size guard (utility/guard.py).

The guard exists because of the round-3 tunnel wedge (BASELINE.md): an
oversized lowering must fail fast on the HOST, before the backend sees it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vkit_tpu.utility import guard


def test_guard_refuses_oversized_program():
    guard.install_program_size_guard()
    saved = dict(guard._state)
    guard._state['max_bytes'] = 1          # everything is oversized
    guard._state['guard_cpu'] = True
    try:
        fn = jax.jit(lambda x: jnp.sin(x) + 1.0)
        with pytest.raises(guard.ProgramSizeError) as err:
            fn(jnp.ones((3, 5, 7)))        # unique shape -> fresh compile
        assert 'refusing to dispatch' in str(err.value)
    finally:
        guard._state.update(saved)


def test_guard_passes_normal_programs_and_is_idempotent():
    guard.install_program_size_guard()
    guard.install_program_size_guard()     # second install is a no-op
    fn = jax.jit(lambda x: x * 2.0)
    out = fn(jnp.asarray(np.arange(11, dtype=np.float32)))
    np.testing.assert_allclose(np.asarray(out), np.arange(11) * 2.0)
