"""Pallas TPU kernels.

The one primitive XLA cannot do fast on TPU is a per-row dynamic shift
(every gather variant measured 5-80 GB/s-equivalent or worse on v5e via the
stock lowering).  This kernel streams rows through VMEM and slices each at
its own offset: an aligned lane-slice plus a dynamic in-register roll.

Used by ops/warp_mxu.py, where the backward affine warp is decomposed into
per-line integer shifts (this kernel) + 3-tap one-hot matmuls (MXU).
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Dynamic-shift lane rolls are only exact on register-group-aligned windows
# of this size (measured: 896-lane windows mis-rotate, 1024 is exact).
_ROLL_WINDOW = 1024


def _row_shift_kernel(starts_ref, in_ref, out_ref, *, rows_per_block, out_width):
    b = pl.program_id(0)
    lb = pl.program_id(1)
    row0 = lb * rows_per_block

    def body(r, carry):
        s = starts_ref[b, row0 + r]
        aligned = pl.multiple_of((s // 128) * 128, 128)
        residual = s - aligned
        window = in_ref[0, pl.ds(r, 1), pl.ds(aligned, _ROLL_WINDOW)]
        rolled = pltpu.roll(window, shift=-residual, axis=1)
        out_ref[0, r, :] = rolled[0, :out_width]
        return carry

    lax.fori_loop(0, rows_per_block, body, 0)


def row_shift(
    x_padded,
    starts,
    out_width: int,
    rows_per_block: int = 128,
    interpret: bool = False,
):
    """``out[b, l, j] = x_padded[b, l, starts[b, l] + j]``.

    Requirements: ``out_width <= 896``; ``0 <= starts`` and
    ``starts + 1024 <= x_padded.shape[-1]`` (the roll window must stay in
    bounds); L is padded to a multiple of ``rows_per_block`` internally.
    """
    assert out_width <= _ROLL_WINDOW - 128
    B, L, Mpad = x_padded.shape
    assert Mpad >= _ROLL_WINDOW

    pad_l = (-L) % rows_per_block
    if pad_l:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, pad_l), (0, 0)))
        starts = jnp.pad(starts, ((0, 0), (0, pad_l)))
    L_padded = L + pad_l

    kernel = functools.partial(
        _row_shift_kernel, rows_per_block=rows_per_block, out_width=out_width
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L_padded // rows_per_block),
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_block, Mpad),
                lambda b, lb, starts: (b, lb, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_block, out_width),
            lambda b, lb, starts: (b, lb, 0),
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L_padded, out_width), x_padded.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), x_padded)
    if pad_l:
        out = out[:, :L]
    return out


def row_shift_auto(x_padded, starts, out_width: int, rows_per_block: int = 128):
    """row_shift with interpret mode on non-TPU backends (CPU tests)."""
    interpret = jax.default_backend() not in ('tpu', 'axon')
    return row_shift(
        x_padded, starts, out_width,
        rows_per_block=rows_per_block, interpret=interpret,
    )
