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
import numpy as np
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
    starts = starts.astype(jnp.int32)
    chunks = []
    for b0, b1 in _b_chunks(B, L_padded):
        nb = b1 - b0
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, L_padded // rows_per_block),
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
        chunks.append(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (nb, L_padded, out_width), x_padded.dtype
            ),
            grid_spec=grid_spec,
            interpret=interpret,
        )(starts[b0:b1], x_padded[b0:b1]))
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
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

# The scalar-prefetch operand (per-row starts) lives in SMEM, which is
# 1 MiB on v5e — one whole (B, L) int32 array per pallas_call.  Region
# flatten stacks batch THOUSANDS of rows (region rows pad to powers of
# two), and a (2048, 512) starts array is 4 MiB: the compile fails with
# 'Allocation would exceed memory (space=smem)'.  Calls are therefore
# CHUNKED along B so each pallas_call prefetches at most this many
# int32s (256 KiB — headroom for Mosaic's own SMEM use); the chunks
# still lower into ONE XLA program, so dispatch count is unchanged.
_SMEM_STARTS_ELEMS = 65536


def _b_chunks(b: int, l_padded: int):
    chunk = max(1, _SMEM_STARTS_ELEMS // max(l_padded, 1))
    return [(i, min(i + chunk, b)) for i in range(0, b, chunk)]


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

    # Keep the double-buffered in+out blocks inside the ~16MB VMEM budget
    # (wide windows at C=5 overflow at 128 rows/block).  Mosaic pads the
    # channel (sublane) dim to 8, so budget with the PADDED channel count.
    itemsize = np.dtype(x.dtype).itemsize
    c_pad = -(-C // 8) * 8
    budget = 9 * 1024 * 1024
    cap = budget // max(c_pad * (in_width + out_width) * itemsize * 2, 1)
    rows_per_block = int(min(rows_per_block, max(16, (cap // 16) * 16)))

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
    starts = starts.astype(jnp.int32)
    chunks = []
    for b0, b1 in _b_chunks(B, L_padded):
        nb = b1 - b0
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, L_padded // rows_per_block),
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
        chunks.append(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (nb, L_padded, C, out_width), x.dtype
            ),
            grid_spec=grid_spec,
            interpret=interpret,
        )(starts[b0:b1], x[b0:b1]))
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
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
    starts = starts.astype(jnp.int32)
    chunks = []
    for b0, b1 in _b_chunks(B, L_padded):
        nb = b1 - b0
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, L_padded // rows_per_block),
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
        chunks.append(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (nb, L_padded, out_width), x.dtype
            ),
            grid_spec=grid_spec,
            interpret=interpret,
        )(starts[b0:b1], x[b0:b1]))
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
    if pad_l:
        out = out[:, :L]
    return out


# ---------------------------------------------------------------------------
# Banded line resample: the general 1-D resampling primitive behind the
# batched warp.  For each output line and each 128-lane block of output
# positions, the sampling positions deviate from a unit-slope baseline by
# only a few pixels (any smooth backward field at near-unit scale), so the
# whole resample is: ONE in-VMEM roll per (row, block) to the block's
# integer base, then TAPS static lane-slices blended by per-pixel hat
# weights.  Replaces the one-hot tap matmuls (whose m_shift x J one-hot
# operands cost ~0.5GB/tap of HBM traffic) and every gather.
# ---------------------------------------------------------------------------


def _banded_resample_kernel(
    base_ref, in_ref, pos_ref, out_ref, scratch_ref, *,
    rows_per_block, channels, in_width, j_blocks, taps, border_value, off,
):
    n = pl.program_id(0)
    lb = pl.program_id(1)
    row0 = lb * rows_per_block

    def body(r, carry):
        scratch_ref[:, :] = jnp.full(
            (channels, _WINDOW2), border_value, dtype=scratch_ref.dtype
        )
        scratch_ref[:, off:off + in_width] = in_ref[0, r, :, :]
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
        pos_row = pos_ref[0, pl.ds(r, 1), :]               # (1, JP)
        for blk in range(j_blocks):
            b = base_ref[n, ((row0 + r) // 8) * j_blocks + blk]
            # rolled[p] = win[p + b] (win at scratch offset `off`).
            # roll(x, s)[i] = x[i - s]; want rolled[p] = win[p + b], i.e.
            # s = -(off + b) — expressed non-negatively mod the window.
            rolled = pltpu.roll(
                scratch_ref[:, :],
                shift=jnp.remainder(_WINDOW2 - off - b, _WINDOW2),
                axis=1,
            )
            # Aligned 256-lane window; per-tap values via STATIC rolls
            # (Mosaic cannot lane-slice at unaligned offsets).
            win = rolled[:, :256]
            pos_blk = pos_row[:, blk * 128:(blk + 1) * 128]
            u = pos_blk - (b.astype(jnp.float32) + lane)   # (1, 128)
            acc = jnp.zeros((channels, 128), dtype=jnp.float32)
            for t in range(taps):
                w = jnp.maximum(1.0 - jnp.abs(u - t), 0.0)
                sub = pltpu.roll(win, shift=(256 - t) % 256, axis=1)[:, :128]
                acc = acc + sub * w
            out_ref[0, r, :, blk * 128:(blk + 1) * 128] = acc
        return carry

    lax.fori_loop(0, rows_per_block, body, 0)


def banded_line_resample(
    x,
    base,
    pos,
    taps: int,
    border_value: float = 0.0,
    rows_per_block: int = 32,
    interpret: Optional[bool] = None,
):
    """``out[n, l, c, j] = interp(x[n, l, c, :], at=pos[n, l, j])``.

    ``base``: (N, ceil(L/8), J/128) int32 — integer base per 8-LINE GROUP
    and 128-lane block (grouped so the whole array fits the 1MB scalar
    SMEM); the planner guarantees ``pos - (base + (j - j0)) in
    [0, taps-2]`` wherever the output is consumed.  ``pos``: (N, L, J)
    f32, J a multiple of 128.  Out-of-source positions read
    ``border_value``.
    """
    n, l, c, in_width = x.shape
    jp = pos.shape[-1]
    assert jp % 128 == 0 and base.shape[-1] == jp // 128
    assert base.shape[1] == -(-l // 8), (base.shape, l)
    nblk = jp // 128
    assert taps <= 128, taps
    assert in_width + 128 + 256 <= _WINDOW2
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')

    off = 512
    itemsize = np.dtype(x.dtype).itemsize
    c_pad = -(-c // 8) * 8
    budget = 8 * 1024 * 1024
    per_row = c_pad * (in_width + jp) * itemsize * 2 + jp * 8
    rows_per_block = int(
        min(rows_per_block, max(8, (budget // per_row) // 8 * 8))
    )

    pad_l = (-l) % rows_per_block
    if pad_l:
        x = jnp.pad(x, ((0, 0), (0, pad_l), (0, 0), (0, 0)))
        pos = jnp.pad(pos, ((0, 0), (0, pad_l), (0, 0)))
    l_padded = l + pad_l
    pad_g = -(-l_padded // 8) - base.shape[1]
    if pad_g > 0:
        base = jnp.pad(base, ((0, 0), (0, pad_g), (0, 0)), mode='edge')
    # Scalar-prefetch arrays live lane-padded in 1MB SMEM: flatten the
    # (groups, blocks) tail so padding stays negligible.
    base = base.reshape(base.shape[0], -1)

    kernel = functools.partial(
        _banded_resample_kernel,
        rows_per_block=rows_per_block,
        channels=c,
        in_width=in_width,
        j_blocks=jp // 128,
        taps=taps,
        border_value=border_value,
        off=off,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, l_padded // rows_per_block),
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_block, c, in_width),
                lambda b, lb, base: (b, lb, 0, 0),
            ),
            pl.BlockSpec(
                (1, rows_per_block, jp),
                lambda b, lb, base: (b, lb, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_block, c, jp),
            lambda b, lb, base: (b, lb, 0, 0),
        ),
        scratch_shapes=[pltpu.VMEM((c, _WINDOW2), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, l_padded, c, jp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base.astype(jnp.int32), x.astype(jnp.float32), pos.astype(jnp.float32))
    if pad_l:
        out = out[:, :l]
    return out
