"""Block-factorized Pallas TPU kernel for GSC's adaptive stage.

Exact lookahead-8 factorization of the reference's per-sample LMS
recurrence (gsc.cpp:120-179), prototyped in tools/gsc_block_proto.py:
within each 8-sample group the filters are frozen, so

  out[t] = d[t] - sum_c <g_c(group start), b_c(t)>        (base dots)
           - sum_{s in group, s<t} sum_c w_c[s] <b_c(s), b_c(t)>

where w_c[s] = mu_c[s]*out[s] carries the dynamic-mu gating, inf-scrub
and VAD gate on the scalar side, and the filter updates land as rank-1
FMAs during the serial phase (they only affect LATER groups' dots).

Why this beats the per-sample kernel (kernels/gsc_pallas.py):

- The serial dependency chain per sample shrinks from ~25 ops on
  (B, C, K) registers to a handful of ops on packed (1, B, 128) rows:
  the per-channel scalar math (bsq, cond, mu, w) lives on a packed lane
  layout (lane c*8+l), so each step is a 4-vreg op instead of 60.
- The 8 base dots per group are data-independent (frozen filters) and
  windows are built by static-shift rolls from a two-tile input view
  (prev 128 | current 128 samples), giving the VPU instruction-level
  parallelism the one-sample-at-a-time form cannot.
- The window-pair Grams <b(t-l), b(t)> (lags 0..7) update incrementally
  from an XLA-precomputed packed difference stream
  D[t, c*8+l] = u[t]u[t-l] - u[t-K]u[t-K-l]  (one 4-vreg add/sample),
  with an exact recomputation every 128-sample subtile bounding f32
  drift (same policy as the power sums).

Numerics: algebraically exact vs the per-sample recurrence (different
summation order only, ~1e-6 f32 relative); the one semantic deviation is
NaN scrubbing of the filters at group boundaries instead of per sample,
which only matters for pathologically diverging filters.

Requires filter_size == 128 and 2..17 mics (C*8 <= 128 packed lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamform_tpu.config import GscParams

L = 8              # lookahead group size
SUB = 128          # subtile (lane width)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _lane_reduce(x):
    """Sum over the last axis of a (1, B, 128) row -> (1, B, 1)."""
    return jnp.sum(x, axis=2, keepdims=True)


def _window(prev, cur, o):
    """128-lane window ending o-1 lanes into ``cur``: lanes [o, o+127] of
    the logical 256-lane [prev|cur] pair, via one static roll of each tile
    and a lane select (o in 1..128)."""
    lanes = _lane_iota(prev.shape)
    ra = pltpu.roll(prev, SUB - o, 2)
    rb = pltpu.roll(cur, SUB - o, 2)
    if o == SUB:
        return cur
    return jnp.where(lanes < SUB - o, ra, rb)


def _kernel(u_ref, d_ref, dg_ref,
            blk_in, flt_in, lo_in, gram_in, uold_in,
            out_ref, blk_out, flt_out, lo_out, gram_out, uold_out,
            fltfro, uprev, uprev2, lo, gacc, wreg,
            *, params: GscParams, chunk: int, c: int, bsz: int):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    k = SUB
    kinv = np.float32(1.0 / k)
    c_b = np.float32(params.mu0 * params.mu0)
    c_o = np.float32(params.mu_max * params.mu_max)
    mu0 = np.float32(params.mu0)

    row = (1, bsz, SUB)
    lanes_r = jax.lax.broadcasted_iota(jnp.int32, row, 2)
    lanes_k = jax.lax.broadcasted_iota(jnp.int32, (c, bsz, SUB), 2)
    lmod = lanes_r % L

    @pl.when(step == 0)
    def _():
        fltfro[:] = flt_in[:]
        uprev[:] = blk_in[:]
        uprev2[:] = uold_in[:]     # only lanes 120..127 are real history
        lo[:] = lo_in[:]
        gacc[:] = gram_in[:]
        wreg[:] = jnp.zeros(row, jnp.float32)

    def csum(x):
        """Sum a (C, B, 128) value over channels -> (1, B, 128)."""
        total = x[0:1]
        for cc in range(1, c):
            total = total + x[cc:cc + 1]
        return total

    def lag_dots(wprev2, wprev):
        """Exact per-channel window dots <b(t-l), b(t)> (l = 0..7) for the
        last sample of the tile ``wprev``, packed into a (1, B, 128) row
        at lanes c*8+l — the subtile Gram refresh."""
        g = jnp.zeros(row, jnp.float32)
        for l in range(L):
            if l == 0:
                win = wprev
            else:
                lanes = _lane_iota(wprev.shape)
                win = jnp.where(lanes >= l,
                                pltpu.roll(wprev, l, 2),
                                pltpu.roll(wprev2, l, 2))
            prod = win * wprev                           # (C, B, 128)
            dots = jnp.sum(prod, axis=2, keepdims=True)  # (C, B, 1)
            for cc in range(c):
                g = jnp.where(lanes_r == cc * L + l, dots[cc:cc + 1], g)
        return g

    nsub = chunk // SUB
    for s in range(nsub):
        u_t = u_ref[:, :, s * SUB:(s + 1) * SUB]         # (C, B, 128)

        # exact Gram + power refresh at subtile boundaries (bounds the
        # running-sum drift to 128 samples); the very first boundary of
        # the call keeps the carried state instead
        if s == 0:
            @pl.when(step != 0)
            def _():
                gacc[:] = lag_dots(uprev2[:], uprev[:])
        else:
            gacc[:] = lag_dots(uprev2[:], uprev[:])
        osq = _lane_reduce(lo[:] * lo[:])                # (1, B, 1)

        for g in range(SUB // L):
            # ---- dot phase: 8 independent base dots vs frozen filters;
            # windows build incrementally (roll-1 + one-lane insert beats
            # re-deriving each from the two-tile pair)
            wins = []
            dots = []
            fro = fltfro[:]
            win = _window(uprev[:], u_t, g * L + 1)
            for i in range(L):
                j = g * L + i
                if i:
                    win = jnp.where(lanes_k == SUB - 1,
                                    u_t[:, :, j:j + 1],
                                    pltpu.roll(win, SUB - 1, 2))
                wins.append(win)
                dots.append(_lane_reduce(csum(fro * win)))

            # ---- serial phase: packed scalar chain only — the filter
            # updates are deferred to the group boundary (they first
            # affect the NEXT group's dots)
            w_rows = []
            for i in range(L):
                j = s * SUB + g * L + i
                gacc[:] = gacc[:] + dg_ref[j].reshape(row)
                grow = gacc[:]
                corr = _lane_reduce(wreg[:] * grow)
                d_j = d_ref[:, :, j:j + 1]               # (1, B, 1)
                out = d_j - dots[i] - corr

                old = lo[:, :, 0:1]
                lo[:] = jnp.where(lanes_r == k - 1, out,
                                  pltpu.roll(lo[:], k - 1, 2))
                osq = osq + out * out - old * old

                # bsq broadcast: lag-0 lanes spread over each 8-lane group
                b0 = jnp.where(lmod == 0, grow, 0.0)
                b0 = b0 + pltpu.roll(b0, 1, 2)
                b0 = b0 + pltpu.roll(b0, 2, 2)
                bb = b0 + pltpu.roll(b0, 4, 2)
                cond = (c_b * bb) < (c_o * osq)
                den = jnp.where(cond, osq, bb) * kinv
                mu_raw = mu0 * jax.lax.rsqrt(jnp.maximum(den, 0.0))
                mu = jnp.where(mu_raw < jnp.inf, mu_raw, 0.0)
                w_row = mu * out
                if params.use_vad:
                    upd = jnp.sqrt(jnp.maximum(osq, 0.0) * kinv) \
                        < params.vad_threshold
                    w_row = jnp.where(upd, w_row, 0.0)
                w_rows.append(w_row)

                wreg[:] = jnp.where(
                    lmod == 0, 0.0,
                    jnp.where(lmod == 1, w_row,
                              pltpu.roll(wreg[:], 1, 2)))

            # group boundary: rank-8 filter update (ILP: 8 independent
            # rank-1 terms summed off the serial chain), NaN scrub
            # (per-sample in the reference; only diverging filters can
            # tell the difference) and W reset
            delta = None
            for i in range(L):
                w_cb1 = jnp.concatenate(
                    [w_rows[i][:, :, cc * L:cc * L + 1] for cc in range(c)],
                    axis=0)                              # (C, B, 1)
                term = w_cb1 * wins[i]
                delta = term if delta is None else delta + term
            fltfro[:] = jnp.where(jnp.isnan(fltfro[:] + delta), 0.0,
                                  fltfro[:] + delta)
            wreg[:] = jnp.zeros(row, jnp.float32)

        # the K-long last-outputs register holds this subtile's outputs
        out_ref[s] = lo[0]
        uprev2[:] = uprev[:]
        uprev[:] = u_t

    @pl.when(step == nsteps - 1)
    def _():
        flt_out[:] = fltfro[:]
        blk_out[:] = uprev[:]
        lo_out[:] = lo[:]
        gram_out[:] = gacc[:]
        uold_out[:] = uprev2[:]


def gsc_block_pallas_batched(aligned, block, filt, last_out, gram, uold,
                             params: GscParams, chunk: int = 384,
                             interpret: bool = False):
    """Run the block-factorized adaptive stage for a batch of streams.

    aligned:  (B, M, S) float32 with S % chunk == 0 and chunk % 128 == 0
    block:    (B, C, K)  u-history shift register (C = M-1, K = 128)
    filt:     (B, C, K)  adaptive filters
    last_out: (B, K)     output history
    gram:     (B, C, 8)  window-pair Grams <b(t-1-l), b(t-1)>, l = 0..7
    uold:     (B, C, 8)  u[t-K-8 .. t-K-1] (pre-register history)

    Returns (out (B, S), block', filt', last_out', gram', uold').
    """
    bsz, m, s_len = aligned.shape
    c = m - 1
    k = filt.shape[-1]
    assert k == SUB, "block kernel requires filter_size == 128"
    assert 1 <= c * L <= SUB, f"needs 2..17 mics, got {m}"
    assert chunk % SUB == 0 and s_len % chunk == 0, (s_len, chunk)

    f32 = jnp.float32
    u = (aligned[:, 1:, :] - aligned[:, :-1, :]).astype(f32)  # (B, C, S)
    d = jnp.mean(aligned, axis=1, dtype=f32)                  # (B, S)

    # packed Gram difference stream: D[t, c*8+l] =
    #   u[t]u[t-l] - u[t-K]u[t-K-l], with the carried K+8 history
    hist = jnp.concatenate([uold.astype(f32), block.astype(f32)],
                           axis=-1)                           # (B, C, K+8)
    ufull = jnp.concatenate([hist, u], axis=-1)               # K+8+S
    h = k + L
    ds = []
    for l in range(L):
        cur = ufull[..., h:] * ufull[..., h - l:ufull.shape[-1] - l]
        old = (ufull[..., h - k:h - k + s_len]
               * ufull[..., h - k - l:h - k - l + s_len])
        ds.append(cur - old)                                  # (B, C, S)
    dg = jnp.stack(ds, axis=-1)                               # (B, C, S, 8)
    dg = jnp.moveaxis(dg, 2, 0).reshape(s_len, bsz, c * L)
    dg = jnp.pad(dg, ((0, 0), (0, 0), (0, SUB - c * L)))      # (S, B, 128)

    uT = jnp.moveaxis(u, 0, 1)                                # (C, B, S)
    dT = d[None]                                              # (1, B, S)
    blkT = jnp.moveaxis(block.astype(f32), 0, 1)              # (C, B, K)
    fltT = jnp.moveaxis(filt.astype(f32), 0, 1)
    loT = last_out.astype(f32)[None]                          # (1, B, K)
    gpk = jnp.pad(gram.astype(f32).reshape(bsz, c * L),
                  ((0, 0), (0, SUB - c * L)))[None]           # (1, B, 128)
    # uold positioned at lanes 120..127 of a (C, B, 128) tile
    uoldT = jnp.pad(jnp.moveaxis(uold.astype(f32), 0, 1),
                    ((0, 0), (0, 0), (SUB - L, 0)))

    nsteps = s_len // chunk
    kernel = functools.partial(_kernel, params=params, chunk=chunk, c=c,
                               bsz=bsz)

    def st_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    rows = chunk // SUB
    out, blk_o, flt_o, lo_o, gr_o, uo_o = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((c, bsz, chunk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, chunk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, bsz, SUB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            st_spec((c, bsz, k)),
            st_spec((c, bsz, k)),
            st_spec((1, bsz, k)),
            st_spec((1, bsz, SUB)),
            st_spec((c, bsz, SUB)),
        ],
        out_specs=[
            pl.BlockSpec((rows, bsz, SUB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            st_spec((c, bsz, k)),
            st_spec((c, bsz, k)),
            st_spec((1, bsz, k)),
            st_spec((1, bsz, SUB)),
            st_spec((c, bsz, SUB)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsteps * rows, bsz, SUB), f32),
            jax.ShapeDtypeStruct((c, bsz, k), f32),
            jax.ShapeDtypeStruct((c, bsz, k), f32),
            jax.ShapeDtypeStruct((1, bsz, k), f32),
            jax.ShapeDtypeStruct((1, bsz, SUB), f32),
            jax.ShapeDtypeStruct((c, bsz, SUB), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, bsz, k), f32),      # fltfro
            pltpu.VMEM((c, bsz, SUB), f32),    # uprev
            pltpu.VMEM((c, bsz, SUB), f32),    # uprev2
            pltpu.VMEM((1, bsz, k), f32),      # lo
            pltpu.VMEM((1, bsz, SUB), f32),    # gacc
            pltpu.VMEM((1, bsz, SUB), f32),    # wreg
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(uT, dT, dg, blkT, fltT, loT, gpk, uoldT)

    out_b = jnp.moveaxis(out, 1, 0).reshape(bsz, s_len)
    return (out_b,
            jnp.moveaxis(blk_o, 0, 1),
            jnp.moveaxis(flt_o, 0, 1),
            lo_o[0],
            gr_o[0, :, :c * L].reshape(bsz, c, L),
            jnp.moveaxis(uo_o[:, :, SUB - L:], 0, 1))
