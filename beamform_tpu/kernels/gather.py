"""Pallas TPU windowed row gather.

XLA's TPU gather lowers to ~0.7-4 us per gathered row regardless of row
size (measured on v5e — latency-bound, no batching), which makes the
gate-sparse MVDR/LCMV history fetch slower than just solving every bin.
This kernel issues one async DMA per candidate window (HBM -> VMEM, rows
are contiguous (w, width) blocks) with a rotating in-flight set, so the
fetch runs at DMA-issue rate (~tens of ns per copy) instead of XLA-gather
rate.

Used by models/gated_sparse.py: candidates gather their (W+1, M) FFT
history windows (layout (Nib*(W+T), 2M) real|imag) and per-bin steering
rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NSEM = 8   # DMA copies kept in flight


def _gather_kernel(rows_ref, src_ref, out_ref, sems, *, w: int, c: int):
    def copy(j, dst_slot):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(rows_ref[j], w)],
            out_ref.at[dst_slot],
            sems.at[dst_slot % _NSEM])

    def body(j, _):
        copy(j, j).start()

        @pl.when(j >= _NSEM - 1)
        def _():
            copy(j - _NSEM + 1, j - _NSEM + 1).wait()
        return 0

    jax.lax.fori_loop(0, c, body, 0)
    for j in range(max(c - _NSEM + 1, 0), c):   # static tail drain
        copy(j, j).wait()


def gather_windows(src, rows, w: int):
    """src (R, width) f32; rows (C,) int32 row starts (each in
    [0, R - w]); returns (C, w, width) — src[rows[j] : rows[j] + w] per j.

    One DMA per candidate; the caller picks a layout where each candidate's
    data is one contiguous (w, width) block. ``width`` must be a multiple
    of 128 (lane-tile alignment for the DMA slice).
    """
    r, width = src.shape
    assert width % 128 == 0, width
    c = rows.shape[0]
    kernel = functools.partial(_gather_kernel, w=w, c=c)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((c, w, width), src.dtype),
    )(rows, src)
