"""Pallas TPU kernel for GSC's sample-serial adaptive stage.

The reference's inner loop (gsc.cpp:120-179) is irreducibly sequential: each
output sample feeds the next filter update. As a ``lax.scan`` over samples
every step pays XLA loop overhead for a few hundred FLOPs of work; this
kernel runs the whole recurrence on-core — the grid walks sample-chunks
(TPU grids execute sequentially), the filter state lives in VMEM scratch
across grid steps, and each sample is a handful of VPU ops.

The kernel is natively BATCHED over independent streams: per-sample cost is
dominated by instruction issue (rolls, selects, sqrt), not VPU throughput,
so stacking B streams on the sublane axis of every register amortizes the
overhead across the batch — the production multi-stream serving path.

Mosaic constraints shape the implementation (see inline notes): vector-only
VMEM stores, tile-aligned dynamic offsets (static subtiles + rolling input
registers), state in scratch refs, no short-vector lane<->sublane
transposes, and O(1) running power sums refreshed exactly every 128 samples.

Bit-matched against the lax.scan formulation in interpret mode and on
device (~4e-8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamform_tpu.config import GscParams


def _kernel(in_ref, blk_in, flt_in, lo_in,
            out_ref, blk_out, flt_out, lo_out,
            blk, flt, lo, *, params: GscParams, chunk: int, m: int,
            batch: int):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    k = blk.shape[-1]

    @pl.when(step == 0)
    def _():
        blk[:] = blk_in[:]
        flt[:] = flt_in[:]
        lo[:] = lo_in[:]

    kinv = np.float32(1.0 / k)
    c_b = np.float32(params.mu0 * params.mu0 / k)
    c_o = np.float32(params.mu_max * params.mu_max / k)
    mu0 = np.float32(params.mu0)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (batch, m - 1, k), 2)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (batch, 1, k), 2)

    def sample_step(j, carry):
        u_rot, d_rot, bsq, osq = carry            # running sums of squares
        u_new = u_rot[:, :, 0:1]                  # (B, M-1, 1) this sample
        das = d_rot[:, :, 0:1]                    # (B, 1, 1)

        # shift registers: left-shift by one == roll right by K-1
        # (pltpu.roll requires non-negative shifts); newest in last column
        b_old = blk[:, :, 0:1]
        blk[:] = jnp.where(lane_b == k - 1, u_new,
                           pltpu.roll(blk[:], k - 1, 2))
        b = blk[:]
        bsq = bsq + u_new * u_new - b_old * b_old

        # reduce channels (sublanes) BEFORE lanes: the lane-shuffle tree
        # then runs on a (B, 1, K) row (4 vregs) instead of the full
        # (B, M-1, K) register set (~60 vregs x log2(K) rounds) — the
        # total is all the recurrence needs (per-channel block powers are
        # tracked incrementally as bsq)
        prod = flt[:] * b
        chan_sum = jnp.sum(prod, axis=1, keepdims=True)         # (B,1,K)
        out = das - jnp.sum(chan_sum, axis=2, keepdims=True)    # (B,1,1)

        o_old = lo[:, 0:1, 0:1]
        lo[:] = jnp.where(lane_o == k - 1, out,
                          pltpu.roll(lo[:], k - 1, 2))
        osq = osq + out * out - o_old * o_old

        # squared-domain dynamic-mu gate + one rsqrt (same arithmetic as
        # the lax.scan formulation in models/gsc.py — see its note)
        cond = (c_b * bsq) < (c_o * osq)
        den = jnp.where(cond, osq, bsq) * kinv
        mu_raw = mu0 * jax.lax.rsqrt(jnp.maximum(den, 0.0))
        mu = jnp.where(mu_raw < jnp.inf, mu_raw, 0.0)

        flt_new = flt[:] + mu * out * b
        flt_new = jnp.where(jnp.isnan(flt_new), 0.0, flt_new)
        if params.use_vad:
            last_pow = jnp.sqrt(jnp.maximum(osq, 0.0) * kinv)
            flt_new = jnp.where(last_pow < params.vad_threshold, flt_new,
                                flt[:])
        flt[:] = flt_new
        return (pltpu.roll(u_rot, 127, 2),        # next sample to column 0
                pltpu.roll(d_rot, 127, 2),
                bsq, osq)

    bsq = jnp.sum(blk[:] ** 2, axis=2, keepdims=True)
    osq = jnp.sum(lo[:] ** 2, axis=2, keepdims=True)
    for sub in range(chunk // 128):               # static subtile loop
        tile = in_ref[:, :, sub * 128:(sub + 1) * 128]   # (B, M, 128)
        u_tile = tile[:, 1:, :] - tile[:, :-1, :]        # per-subtile diffs
        d_tile = jnp.sum(tile, axis=1, keepdims=True) * np.float32(1.0 / m)
        _, _, bsq, osq = jax.lax.fori_loop(0, 128, sample_step,
                                           (u_tile, d_tile, bsq, osq))
        # the newest 128 entries of the last-outputs register ARE the next
        # output row for every stream (ascending order)
        out_ref[:, sub, :] = lo[:, 0, k - 128:k]
        # exact refresh bounds the running-sum drift per subtile
        bsq = jnp.sum(blk[:] ** 2, axis=2, keepdims=True)
        osq = jnp.sum(lo[:] ** 2, axis=2, keepdims=True)

    @pl.when(step == nsteps - 1)
    def _():
        blk_out[:] = blk[:]
        flt_out[:] = flt[:]
        lo_out[:] = lo[:]


def gsc_adaptive_pallas_batched(aligned, block, filt, last_out,
                                params: GscParams, chunk: int = 1024,
                                interpret: bool = False):
    """Run the adaptive stage for a batch of streams.

    aligned: (B, M, S) float32 with S % chunk == 0; block/filt: (B, M-1, K);
    last_out: (B, K). Returns (out (B, S), block', filt', last_out').
    """
    bsz, m, s = aligned.shape
    assert chunk % 128 == 0, chunk
    assert s % chunk == 0, (s, chunk)
    k = filt.shape[-1]
    assert k >= 128, "kernel drains outputs via the K-long register"
    nsteps = s // chunk
    rows = chunk // 128
    lo2 = last_out.reshape(bsz, 1, k)

    kernel = functools.partial(_kernel, params=params, chunk=chunk, m=m,
                               batch=bsz)

    def st_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out, blk_o, flt_o, lo_o = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((bsz, m, chunk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            st_spec((bsz, m - 1, k)),
            st_spec((bsz, m - 1, k)),
            st_spec((bsz, 1, k)),
        ],
        out_specs=[
            pl.BlockSpec((bsz, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            st_spec((bsz, m - 1, k)),
            st_spec((bsz, m - 1, k)),
            st_spec((bsz, 1, k)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nsteps * rows, 128), aligned.dtype),
            jax.ShapeDtypeStruct((bsz, m - 1, k), filt.dtype),
            jax.ShapeDtypeStruct((bsz, m - 1, k), filt.dtype),
            jax.ShapeDtypeStruct((bsz, 1, k), filt.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, m - 1, k), jnp.float32),
            pltpu.VMEM((bsz, m - 1, k), jnp.float32),
            pltpu.VMEM((bsz, 1, k), jnp.float32),
        ],
        interpret=interpret,
    )(aligned, block, filt, lo2)
    return (out.reshape(bsz, -1), blk_o, flt_o,
            lo_o.reshape(bsz, k))


def gsc_adaptive_pallas(aligned, block, filt, last_out, params: GscParams,
                        chunk: int = 1024, interpret: bool = False):
    """Single-stream wrapper: aligned (M, S); block/filt (M-1, K);
    last_out (K,). Returns (out (S,), block', filt', last_out')."""
    out, blk, flt, lo = gsc_adaptive_pallas_batched(
        aligned[None], block[None], filt[None], last_out[None], params,
        chunk=chunk, interpret=interpret)
    return out[0], blk[0], flt[0], lo[0]


def _kernel_xmu(in_ref, blk_in, flt_in, lo_in,
                out_ref, blk_out, flt_out, lo_out,
                blk, flt, lo, *, params: GscParams, chunk: int, m: int,
                batch: int):
    """The per-sample recurrence with the INPUT-ONLY mu quantities hoisted
    to XLA (see gsc_adaptive_pallas_xmu): in_ref packs [audio (M rows) |
    c_b*bsq_c (M-1 rows, exact 128-sample block powers via reduce_window
    outside) | pre-scrubbed q-branch steps mu0/sqrt(bsq_c/K) (M-1 rows)]
    so one blocked stream feeds all three. The serial chain
    keeps only what depends on the outputs: osq, the branch select
    against the precomputed threshold, and the p-branch scalar — the
    (B, C, 1) padded-register block-power arithmetic disappears."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    k = blk.shape[-1]

    @pl.when(step == 0)
    def _():
        blk[:] = blk_in[:]
        flt[:] = flt_in[:]
        lo[:] = lo_in[:]

    kinv = np.float32(1.0 / k)
    c_o = np.float32(params.mu_max * params.mu_max / k)
    mu0 = np.float32(params.mu0)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (batch, m - 1, k), 2)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (batch, 1, k), 2)

    def sample_step(j, carry):
        u_rot, d_rot, cb_rot, q_rot, osq = carry
        u_new = u_rot[:, :, 0:1]                  # (B, M-1, 1) this sample
        das = d_rot[:, :, 0:1]                    # (B, 1, 1)
        cb_now = cb_rot[:, :, 0:1]                # c_b * bsq_c (B, M-1, 1)
        q_now = q_rot[:, :, 0:1]                  # q-branch mu (B, M-1, 1)

        blk[:] = jnp.where(lane_b == k - 1, u_new,
                           pltpu.roll(blk[:], k - 1, 2))
        b = blk[:]

        prod = flt[:] * b
        chan_sum = jnp.sum(prod, axis=1, keepdims=True)         # (B,1,K)
        out = das - jnp.sum(chan_sum, axis=2, keepdims=True)    # (B,1,1)

        o_old = lo[:, 0:1, 0:1]
        lo[:] = jnp.where(lane_o == k - 1, out,
                          pltpu.roll(lo[:], k - 1, 2))
        osq = osq + out * out - o_old * o_old

        # branch select against the precomputed per-channel threshold;
        # the p branch's scalar is the only remaining mu arithmetic
        cond = cb_now < (c_o * osq)
        p_raw = mu0 * jax.lax.rsqrt(jnp.maximum(osq * kinv, 0.0))
        p = jnp.where(p_raw < jnp.inf, p_raw, 0.0)              # (B,1,1)
        mu = jnp.where(cond, p, q_now)

        flt_new = flt[:] + mu * out * b
        flt_new = jnp.where(jnp.isnan(flt_new), 0.0, flt_new)
        if params.use_vad:
            last_pow = jnp.sqrt(jnp.maximum(osq, 0.0) * kinv)
            flt_new = jnp.where(last_pow < params.vad_threshold, flt_new,
                                flt[:])
        flt[:] = flt_new
        return (pltpu.roll(u_rot, 127, 2),
                pltpu.roll(d_rot, 127, 2),
                pltpu.roll(cb_rot, 127, 2),
                pltpu.roll(q_rot, 127, 2),
                osq)

    osq = jnp.sum(lo[:] ** 2, axis=2, keepdims=True)
    for sub in range(chunk // 128):
        tile = in_ref[:, :m, sub * 128:(sub + 1) * 128]  # (B, M, 128)
        u_tile = tile[:, 1:, :] - tile[:, :-1, :]
        d_tile = jnp.sum(tile, axis=1, keepdims=True) * np.float32(1.0 / m)
        cb_tile = in_ref[:, m:2 * m - 1, sub * 128:(sub + 1) * 128]
        q_tile = in_ref[:, 2 * m - 1:, sub * 128:(sub + 1) * 128]
        _, _, _, _, osq = jax.lax.fori_loop(
            0, 128, sample_step, (u_tile, d_tile, cb_tile, q_tile, osq))
        out_ref[:, sub, :] = lo[:, 0, k - 128:k]
        osq = jnp.sum(lo[:] ** 2, axis=2, keepdims=True)

    @pl.when(step == nsteps - 1)
    def _():
        blk_out[:] = blk[:]
        flt_out[:] = flt[:]
        lo_out[:] = lo[:]


def gsc_adaptive_pallas_xmu(aligned, block, filt, last_out,
                            params: GscParams, chunk: int = 1024,
                            interpret: bool = False):
    """The xmu strategy (GscParams.solver="xmu"): identical recurrence to
    :func:`gsc_adaptive_pallas_batched`, with the input-only mu
    quantities precomputed in XLA and streamed in.

    bsq_c[t] (the 128-sample block power after inserting sample t) is an
    exact windowed sum via reduce_window over [carried register history |
    new u samples] — the same fresh-per-sample summation the reference's
    calculate_power performs (gsc.cpp:150), where the in-kernel variant
    maintains it incrementally with per-subtile refreshes; agreement with
    the scan is at f32 round-off (~1e-6) rather than the incremental
    kernel's ~4e-8.
    """
    bsz, m, s = aligned.shape
    assert chunk % 128 == 0 and s % chunk == 0, (s, chunk)
    k = filt.shape[-1]
    assert k >= 128, "kernel drains outputs via the K-long register"
    nsteps = s // chunk
    rows = chunk // 128
    lo2 = last_out.reshape(bsz, 1, k)
    f32 = jnp.float32

    u = (aligned[:, 1:, :] - aligned[:, :-1, :]).astype(f32)  # (B, C, S)
    u_ext = jnp.concatenate([block.astype(f32)[:, :, 1:], u], axis=-1)
    bsq = jax.lax.reduce_window(
        u_ext * u_ext, 0.0, jax.lax.add, (1, 1, k), (1, 1, 1), "valid")
    c_b = np.float32(params.mu0 * params.mu0 / k)
    kinv = np.float32(1.0 / k)
    q_raw = np.float32(params.mu0) * jax.lax.rsqrt(
        jnp.maximum(bsq * kinv, 0.0))
    q = jnp.where(q_raw < jnp.inf, q_raw, 0.0)
    cb = c_b * bsq
    packed = jnp.concatenate([aligned.astype(f32), cb, q], axis=1)

    kernel = functools.partial(_kernel_xmu, params=params, chunk=chunk,
                               m=m, batch=bsz)

    def st_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out, blk_o, flt_o, lo_o = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((bsz, 3 * m - 2, chunk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            st_spec((bsz, m - 1, k)),
            st_spec((bsz, m - 1, k)),
            st_spec((bsz, 1, k)),
        ],
        out_specs=[
            pl.BlockSpec((bsz, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            st_spec((bsz, m - 1, k)),
            st_spec((bsz, m - 1, k)),
            st_spec((bsz, 1, k)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nsteps * rows, 128), aligned.dtype),
            jax.ShapeDtypeStruct((bsz, m - 1, k), filt.dtype),
            jax.ShapeDtypeStruct((bsz, m - 1, k), filt.dtype),
            jax.ShapeDtypeStruct((bsz, 1, k), filt.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, m - 1, k), jnp.float32),
            pltpu.VMEM((bsz, m - 1, k), jnp.float32),
            pltpu.VMEM((bsz, 1, k), jnp.float32),
        ],
        interpret=interpret,
    )(packed, block, filt, lo2)
    return (out.reshape(bsz, -1), blk_o, flt_o,
            lo_o.reshape(bsz, k))
