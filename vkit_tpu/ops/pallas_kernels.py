"""Pallas TPU kernels.

The one primitive XLA cannot do fast on TPU is a per-row dynamic shift
(every gather variant measured 5-80 GB/s-equivalent or worse on v5e via the
stock lowering).  This kernel streams rows through VMEM and slices each at
its own offset: an aligned lane-slice plus a dynamic in-register roll.

Used by ops/warp_mxu.py, where the backward affine warp is decomposed into
per-line integer shifts (this kernel) + 3-tap one-hot matmuls (MXU).
"""
import functools
from typing import Optional

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


# ---------------------------------------------------------------------------
# Borderless variant: the whole (integer) shift as ONE 2048-lane roll per
# row, borders synthesized in-VMEM.  No host-side padding materialization
# (jnp.pad wrote + re-read an HBM copy of the input) and the DMA carries
# only the real row, not a padded window: ~2x less memory traffic than
# row_shift for typical warp shapes.
# ---------------------------------------------------------------------------

_WINDOW2 = 2048


def _row_shift_window_kernel(
    starts_ref, in_ref, out_ref, scratch_ref, *,
    rows_per_block, in_width, out_width, border_value,
):
    b = pl.program_id(0)
    lb = pl.program_id(1)
    row0 = lb * rows_per_block

    def body(r, carry):
        s = starts_ref[b, row0 + r]
        scratch_ref[0, :] = jnp.full(
            (_WINDOW2,), border_value, dtype=scratch_ref.dtype
        )
        scratch_ref[0, :in_width] = in_ref[0, r, :]
        rolled = pltpu.roll(scratch_ref[:, :], shift=-s, axis=1)
        out_ref[0, r, :] = rolled[0, :out_width]
        return carry

    lax.fori_loop(0, rows_per_block, body, 0)


def _row_shift_window_slab_kernel(
    starts_ref, in_ref, out_ref, scratch_ref, *,
    rows_per_block, channels, in_width, out_width, border_value, unroll,
):
    b = pl.program_id(0)
    lb = pl.program_id(1)
    row0 = lb * rows_per_block

    def body(ru, carry):
        # Unrolled: the per-iteration scalar/control overhead of the row
        # loop is comparable to the roll itself.
        for k in range(unroll):
            r = ru * unroll + k
            s = starts_ref[b, row0 + r]
            scratch_ref[:, :] = jnp.full(
                (channels, _WINDOW2), border_value, dtype=scratch_ref.dtype
            )
            scratch_ref[:, :in_width] = in_ref[0, r, :, :]
            # One roll moves every channel of the row (same shift/sublane).
            rolled = pltpu.roll(scratch_ref[:, :], shift=-s, axis=1)
            out_ref[0, r, :, :] = rolled[:, :out_width]
        return carry

    lax.fori_loop(0, rows_per_block // unroll, body, 0)


def row_shift_window_slab(
    x,
    starts,
    out_width: int,
    border_value: float = 0.0,
    rows_per_block: int = 128,
    interpret: Optional[bool] = None,
):
    """Channel-slab variant: ``out[b, l, c, j] = x[b, l, c, starts[b,l]+j]``.

    ``x``: (B, L, C, W).  One roll per row covers all C channels (3x fewer
    kernel iterations than row_shift_window on RGB batches).  Same bounds
    requirements as row_shift_window.
    """
    B, L, C, in_width = x.shape
    assert in_width + out_width <= _WINDOW2
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')

    pad_l = (-L) % rows_per_block
    if pad_l:
        x = jnp.pad(x, ((0, 0), (0, pad_l), (0, 0), (0, 0)))
        starts = jnp.pad(starts, ((0, 0), (0, pad_l)))
    L_padded = L + pad_l

    unroll = 16
    assert rows_per_block % unroll == 0
    kernel = functools.partial(
        _row_shift_window_slab_kernel,
        rows_per_block=rows_per_block,
        channels=C,
        in_width=in_width,
        out_width=out_width,
        border_value=border_value,
        unroll=unroll,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L_padded // rows_per_block),
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_block, C, in_width),
                lambda b, lb, starts: (b, lb, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_block, C, out_width),
            lambda b, lb, starts: (b, lb, 0, 0),
        ),
        scratch_shapes=[pltpu.VMEM((C, _WINDOW2), x.dtype)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (B, L_padded, C, out_width), x.dtype
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), x)
    if pad_l:
        out = out[:, :L]
    return out


def row_shift_window(
    x,
    starts,
    out_width: int,
    border_value: float = 0.0,
    rows_per_block: int = 128,
    interpret: Optional[bool] = None,
):
    """``out[b, l, j] = x[b, l, starts[b, l] + j]`` with border handling.

    ``starts`` may be negative or run past the row; out-of-range positions
    read ``border_value``.  Requirements (asserted):
    ``in_width + out_width <= 2048`` and
    ``-(2048 - in_width - out_width) <= starts <= 2048 - out_width``.
    """
    import functools as _functools

    B, L, in_width = x.shape
    assert in_width + out_width <= _WINDOW2
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')

    pad_l = (-L) % rows_per_block
    if pad_l:
        x = jnp.pad(x, ((0, 0), (0, pad_l), (0, 0)))
        starts = jnp.pad(starts, ((0, 0), (0, pad_l)))
    L_padded = L + pad_l

    kernel = _functools.partial(
        _row_shift_window_kernel,
        rows_per_block=rows_per_block,
        in_width=in_width,
        out_width=out_width,
        border_value=border_value,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L_padded // rows_per_block),
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_block, in_width),
                lambda b, lb, starts: (b, lb, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_block, out_width),
            lambda b, lb, starts: (b, lb, 0),
        ),
        scratch_shapes=[pltpu.VMEM((1, _WINDOW2), x.dtype)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L_padded, out_width), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), x)
    if pad_l:
        out = out[:, :L]
    return out
