"""Tiny TPU liveness probe: one 4x4 matmul on the tunneled chip.

Exit 0 + 'PROBE_OK <seconds>' when the tunnel serves; nonzero otherwise.
Used by bench.py's pre-flight and by the dev loop to poll for tunnel
recovery after a server-side compile wedge (see BASELINE.md round-3
post-mortem) without wedging anything further itself.
"""
import sys
import time


def main() -> int:
    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp

        x = jnp.ones((4, 4), jnp.float32)
        (x @ x).block_until_ready()
    except Exception as exc:  # noqa: BLE001 - report any backend failure
        print(f'PROBE_FAIL {time.time() - t0:.1f}s: {exc!r}', flush=True)
        return 1
    print(f'PROBE_OK {time.time() - t0:.1f}s '
          f'devices={jax.devices()}', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
