"""Pre-flight program-size guard at the XLA compile boundary.

Round-3 postmortem (BASELINE.md "round-3 measurement note"): an oversized
lowering — a glass-blur program with an unrolled pixel-swap loop — was
dispatched to the tunneled TPU backend, the client died waiting, and the
orphaned server-side compile wedged the shared device for hours.  The
reference has no equivalent failure mode (each sample is one Python
process, SURVEY.md §3.4), so this is a TPU-build-specific safety system.

The guard wraps ``jax._src.compiler.compile_or_get_cached`` — the single
choke point every jit/pjit compile passes through (pxla.py calls it via
the module attribute) — measures the MLIR module's bytecode size, and
REFUSES to dispatch any program over the budget: a runaway lowering now
fails fast on the host with the module name, instead of orphaning a
server-side compile.  CPU compiles are exempt by default (they run
locally and the 8-device virtual-mesh tests legitimately build large
modules).

Budget default 48 MiB of StableHLO bytecode — an order of magnitude above
the largest legitimate program in this repo (the full synthesize_batch
page program serializes to ~3 MiB) and an order of magnitude below the
unrolled-loop pathologies the guard exists to catch.  Override with
``VKIT_TPU_MAX_PROGRAM_BYTES``; 0 disables.
"""
import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_BUDGET_BYTES = 48 << 20

_installed = False

# Live settings the installed wrapper reads on every compile, so tests can
# tighten/restore the budget without reinstalling.
_state = {'max_bytes': _DEFAULT_BUDGET_BYTES, 'guard_cpu': False}

# Process-wide compile telemetry (benchmarks assert steady state: zero
# compiles after warmup).  Incremented by the guard wrapper on EVERY
# compile_or_get_cached call, i.e. every program XLA was asked to build
# (persistent-cache hits included — each one still costs a backend round
# trip on a tunneled device).
_compile_log = {'count': 0, 'names': []}


def compile_count() -> int:
    """Number of XLA compile requests since process start (or last reset)."""
    return _compile_log['count']


def recent_compile_names(limit: int = 20):
    """Names of the most recent compiled modules (diagnostics)."""
    return list(_compile_log['names'][-limit:])


def reset_compile_log() -> None:
    _compile_log['count'] = 0
    _compile_log['names'].clear()


class ProgramSizeError(RuntimeError):
    """A lowered program exceeded the pre-flight dispatch budget."""


def install_program_size_guard(max_bytes=None, guard_cpu=False):
    """Install the guard process-wide (idempotent).

    Parameters
    ----------
    max_bytes:
        Dispatch budget in bytes of MLIR bytecode.  ``None`` reads
        ``VKIT_TPU_MAX_PROGRAM_BYTES`` (default 48 MiB); 0 disables.
    guard_cpu:
        Also enforce on the CPU backend (off by default: CPU compiles
        cannot wedge the tunnel, and virtual-mesh tests build large
        legitimate modules).
    """
    global _installed
    if max_bytes is None:
        max_bytes = int(os.environ.get(
            'VKIT_TPU_MAX_PROGRAM_BYTES', _DEFAULT_BUDGET_BYTES
        ))
    _state['max_bytes'] = max_bytes
    _state['guard_cpu'] = guard_cpu
    if _installed:
        return
    if not max_bytes:
        return
    try:
        from jax._src import compiler
        from jax._src.interpreters import mlir
    except Exception:  # noqa: BLE001 - jax internals moved; degrade to no-op
        logger.warning(
            'program-size guard unavailable on this jax version; '
            'oversized lowerings will NOT be intercepted'
        )
        return

    original = compiler.compile_or_get_cached

    def guarded_compile_or_get_cached(backend, computation, *args, **kwargs):
        platform = getattr(backend, 'platform', '')
        _compile_log['count'] += 1
        try:
            _compile_log['names'].append(_module_name(computation))
            if len(_compile_log['names']) > 512:
                del _compile_log['names'][:256]
        except Exception:  # noqa: BLE001 - telemetry must never block
            pass
        budget = _state['max_bytes']
        if budget and (_state['guard_cpu'] or platform != 'cpu'):
            try:
                size = len(mlir.module_to_bytecode(computation))
                name = _module_name(computation)
            except Exception:  # noqa: BLE001 - measurement must never block
                size, name = -1, '<unknown>'
            if size > budget:
                raise ProgramSizeError(
                    f'refusing to dispatch program {name!r}: lowered module '
                    f'is {size / 2**20:.1f} MiB > budget '
                    f'{budget / 2**20:.1f} MiB '
                    f'(platform={platform}). An unrolled loop or oversized '
                    'static shape likely snuck into the trace; fix the '
                    'lowering or raise VKIT_TPU_MAX_PROGRAM_BYTES.'
                )
            if size > budget // 2:
                logger.warning(
                    'program %s lowers to %.1f MiB (budget %.1f MiB) — '
                    'approaching the dispatch guard',
                    name, size / 2**20, budget / 2**20,
                )
        return original(backend, computation, *args, **kwargs)

    compiler.compile_or_get_cached = guarded_compile_or_get_cached
    _installed = True
    logger.debug(
        'program-size guard installed: budget %.1f MiB', max_bytes / 2**20
    )


def _module_name(computation) -> str:
    try:
        from jax._src.lib.mlir import ir

        return ir.StringAttr(
            computation.operation.attributes['sym_name']
        ).value
    except Exception:  # noqa: BLE001
        return '<unnamed>'
