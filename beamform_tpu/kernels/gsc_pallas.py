"""Pallas TPU kernel for GSC's sample-serial adaptive stage.

The reference's inner loop (gsc.cpp:120-179) is irreducibly sequential: each
output sample feeds the next filter update. As a ``lax.scan`` over samples
every step pays XLA loop overhead for a few hundred FLOPs of work; this
kernel runs the whole recurrence on-core — the grid walks sample-chunks
(TPU grids execute sequentially), the filter state lives in VMEM scratch
across grid steps, and each sample is a handful of (M-1, K) VPU ops:

  - blocking-matrix shift register:  static lane-roll + set last column
  - FIR output:                      one multiply + lane reduction
  - powers:                          lane reductions over the registers
  - dynamic-mu LMS update with the reference's NaN/Inf scrubbing

Bit-for-bit identical to the lax.scan formulation (verified in tests via
interpret mode and on-device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamform_tpu.config import GscParams


def _kernel(in_ref, blk_in, flt_in, lo_in,
            out_ref, blk_out, flt_out, lo_out,
            blk, flt, lo, *, params: GscParams, chunk: int, m: int):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    k = blk.shape[-1]

    @pl.when(step == 0)
    def _():
        blk[:] = blk_in[:]
        flt[:] = flt_in[:]
        lo[:] = lo_in[:]

    kinv = 1.0 / k
    # Mosaic constraints shape this loop: VMEM stores must be vectors, and
    # dynamic lane/sublane offsets must be provably tile-aligned. So the
    # kernel (a) updates registers with full-array selects on a lane iota,
    # (b) walks each statically-sliced 128-sample subtile with a ROLLING
    # input register (the current sample is always column 0), and (c)
    # drains outputs as whole 128-lane rows straight from the last-outputs
    # register (its newest 128 entries are exactly the next output row).
    # Cross-lane reductions are the dominant per-sample cost, so the power
    # estimates use O(1) running sums of squares (add the entering sample,
    # subtract the leaving one), refreshed EXACTLY at every 128-sample
    # subtile boundary to bound float32 drift. Keep the (M-1) axis on
    # sublanes throughout (keepdims) — a lane->sublane transpose of a short
    # vector is a Mosaic relayout trap.
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (m - 1, k), 1)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def sample_step(j, carry):
        cur, bsq, osq = carry                         # running sums of sq.
        a = cur[:, 0:1]                               # (M, 1) this sample
        das = jnp.sum(a) / m
        u_new = a[1:, :] - a[:-1, :]                  # (M-1, 1)

        # shift registers: left-shift by one == roll right by K-1
        # (pltpu.roll requires non-negative shifts); newest in last column
        b_old = blk[:, 0:1]
        blk[:] = jnp.where(lane_b == k - 1, u_new,
                           pltpu.roll(blk[:], k - 1, 1))
        b = blk[:]
        bsq = bsq + u_new * u_new - b_old * b_old

        block_out = jnp.sum(flt[:] * b, axis=1, keepdims=True)  # (M-1, 1)
        out = das - jnp.sum(block_out)

        o_old = lo[0:1, 0:1]
        lo[:] = jnp.where(lane_o == k - 1, out, pltpu.roll(lo[:], k - 1, 1))
        osq = osq + out * out - o_old * o_old

        last_pow = jnp.sqrt(jnp.maximum(osq, 0.0) * kinv)
        block_pow = jnp.sqrt(jnp.maximum(bsq, 0.0) * kinv)      # (M-1, 1)

        ratio = params.mu0 * block_pow / last_pow               # (M-1, 1)
        mu = jnp.where(ratio < params.mu_max, params.mu0 / last_pow,
                       params.mu0 / block_pow)
        mu = jnp.where(jnp.isnan(mu) | jnp.isinf(mu), 0.0, mu)

        flt_new = flt[:] + mu * out * b
        flt_new = jnp.where(jnp.isnan(flt_new), 0.0, flt_new)
        if params.use_vad:
            flt_new = jnp.where(last_pow < params.vad_threshold, flt_new,
                                flt[:])
        flt[:] = flt_new
        return (pltpu.roll(cur, 127, 1),              # next sample to col 0
                bsq, osq)

    bsq = jnp.sum(blk[:] ** 2, axis=1, keepdims=True)   # (M-1, 1)
    osq = jnp.sum(lo[:] ** 2, axis=1, keepdims=True)    # (1, 1)
    for sub in range(chunk // 128):                   # static subtile loop
        tile = in_ref[:, sub * 128:(sub + 1) * 128]   # (M, 128), static
        _, bsq, osq = jax.lax.fori_loop(0, 128, sample_step,
                                        (tile, bsq, osq))
        out_ref[sub, :] = lo[0, k - 128:k]
        # exact refresh bounds the running-sum drift per subtile
        bsq = jnp.sum(blk[:] ** 2, axis=1, keepdims=True)
        osq = jnp.sum(lo[:] ** 2, axis=1, keepdims=True)

    @pl.when(step == nsteps - 1)
    def _():
        blk_out[:] = blk[:]
        flt_out[:] = flt[:]
        lo_out[:] = lo[:]


def gsc_adaptive_pallas(aligned, block, filt, last_out, params: GscParams,
                        chunk: int = 1024, interpret: bool = False):
    """Run the full adaptive stage.

    aligned: (M, S) float32 with S % chunk == 0; block/filt: (M-1, K);
    last_out: (K,). Returns (out (S,), block', filt', last_out').
    """
    m, s = aligned.shape
    assert chunk % 128 == 0, chunk
    assert s % chunk == 0, (s, chunk)
    k = filt.shape[-1]
    assert k >= 128, "kernel drains outputs via the K-long register"
    nsteps = s // chunk
    rows = chunk // 128     # output laid out (rows, 128) per grid step
    lo2 = last_out.reshape(1, k)

    kernel = functools.partial(_kernel, params=params, chunk=chunk, m=m)
    out, blk_o, flt_o, lo_o = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((m, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m - 1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m - 1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m - 1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m - 1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsteps * rows, 128), aligned.dtype),
            jax.ShapeDtypeStruct((m - 1, k), filt.dtype),
            jax.ShapeDtypeStruct((m - 1, k), filt.dtype),
            jax.ShapeDtypeStruct((1, k), filt.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((m - 1, k), jnp.float32),
            pltpu.VMEM((m - 1, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
        ],
        interpret=interpret,
    )(aligned, block, filt, lo2)
    return out.reshape(-1), blk_o, flt_o, lo_o.reshape(-1)
