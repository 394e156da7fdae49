"""Mega-fused streaming MVDR/LCMV: analysis -> solve -> synthesis in ONE
Pallas kernel.

The three-stage stream path (kernels/wola_pallas.py analysis ->
kernels/mvdr_stream.py solve -> XLA synthesis) round-trips full spectra
planes through HBM (~460 MB per 30 s at 16 ch / 48 kHz) and pays three
kernel launches plus XLA glue per chunk. This kernel marches the frame axis
once, taking stride-layout audio hops IN and stride-layout audio hops OUT:

- **analysis** per frame: the previous hop lives in VMEM scratch (each hop
  is read from HBM exactly once), frame assembly + sqrt-Hann window + rFFT
  run exactly as kernels/wola_pallas.py (same split DFT constants, two MXU
  stage-1 dots, unrolled VPU stage-2 MACs) — but only the ``k2cov`` leading
  128-bin groups that cover the configured band are ever computed, and the
  spectra never leave VMEM.
- **gate**: the mic-mean |X| magnitude (mvdr.cpp:79-82) and the band mask
  are evaluated in-register; the per-frame activity scalar drives
  ``pl.when`` directly (no precomputed act input — the energy-gate skip of
  mvdr.cpp:84-96 at frame granularity, computed on-core).
- **solve**: the sliding covariance / Cholesky machinery of
  kernels/mvdr_stream.py (rank-1 VMEM updates, epoch-exact resets) reused
  verbatim, with the history-frame spectra kept in a W-slot VMEM ring
  (dynamic leading-dim indexing) instead of a second HBM input stream.
- **synthesis**: Hermitian-fold-free half-spectrum inverse — by linearity
  of the staged iDFT and the final real part, feeding 2*y[k] for
  0 < k < nfft/2 (and y[0] once) through stage-A/twiddle/stage-B
  reproduces the full Hermitian-expanded inverse exactly, so only the
  ``k2cov`` in-band groups are transformed; synthesis window + 50%
  overlap-add with the one-hop carry in VMEM scratch
  (kernels/wola_pallas.py semantics).

Iterative refinement is OFF by default here (and costs ~16% when on):
measured on-chip, the unrefined f32 solve deviates 8.5e-5 (white noise) /
3.8e-4 (speech-like) from the float64 oracle vs 8.9e-5 / 3.6e-4 WITH
refinement — the stream-vs-dense difference is summation order, not solve
conditioning (tests/test_mega_stream.py pins this).

Capacity: analysis covers k2 groups 0..k2cov-1 (bin 0 through the last
in-band bin); bands reaching the Nyquist bin fall back to the three-stage
path (the half-spectrum x2 fold would double-count Nyquist and its
extended shadow bin), and the (M, M, k2cov*128) scratch set must fit
VMEM; see ``mega_fits`` / models/mvdr.py select_solver_strategy3.

Reference semantics: mvdr.cpp:62-115 (the whole per-window pipeline this
kernel fuses), lcmv.cpp:108-138 (constraint-space solve).
"""

from __future__ import annotations

import functools
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamform_tpu.kernels.wola_pallas import (_acc_term, _bf16_pair, _dot3,
                                              _fwd_consts)
from beamform_tpu.kernels.mvdr_stream import (
    _cmul,
    _cmul_conj,
    _col_from_row,
    cholesky_factor_inplace,
    make_solvers,
    sliding_update_cols,
)
from beamform_tpu.kernels.lcmv_stream import constraint_space_apply

FRAMES_PER_STEP = 8

# Lane-grouped solves (round 5): G consecutive frames' covariances
# concatenated on the LANE axis factor and solve in ONE chain of
# G-fold-wide ops — 1/G the serial op count, bit-identical per lane
# (every solver op is lane-elementwise;
# tests/test_mega_stream.py::test_mega_solve_group_invariance).
#
# BUILT, MEASURED ON-CHIP, AND DISPROVEN as a speedup (2026-08-20,
# tools/mega_profile.py, 30 s 16-ch dense input, same session):
#   GROUP=1  1383x RT normal / 1906x gate_off
#   GROUP=2  1176x RT normal / 1809x gate_off   (a 15% LOSS)
# The factor+solve chain (~30% of wall by gate-knob attribution) is
# VPU-THROUGHPUT-bound, not issue/latency-bound: halving the serial op
# count at constant element work buys nothing, while grouping adds the
# unconditional per-frame R snapshot stores (2x (M,M,NIBP) VMEM writes
# even on gate-skipped frames) and the d/x lane concats. The same
# conclusion as the GSC per-sample kernel study (docs/ROADMAP.md item 1):
# the per-frame chain is already near its practical floor. Default stays
# 1; BEAMFORM_MEGA_GROUP re-enables the variant for remeasurement.
SOLVE_GROUP = 1

# One pallas launch covers at most this many frames; longer streams chain
# segments (ring/OLA carries) inside one jit. Keeping each launch's outputs
# small matters on-chip: XLA's memory-space assignment likes to place the
# custom call's outputs in VMEM (S(1)), so the audio output's footprint
# adds to the kernel's ~19 MB scoped set — one big launch worked AOT but
# crashed the runtime once total pressure passed the chip's usable VMEM.
SEG_FRAMES = 96


@lru_cache(maxsize=8)
def _synth_consts(nfft: int, k2cov: int):
    """Half-spectrum synthesis constants: stage-A weights with the
    Hermitian x2 folded in (lane-broadcast (k2cov, n2, 128) — bin 0's
    halving happens on the y row), inverse twiddle, stage-B iDFT."""
    n2 = nfft // 128
    k1 = np.arange(128)
    wa = 2.0 * np.exp(2j * np.pi
                      * np.outer(np.arange(k2cov), np.arange(n2)) / n2)
    wa_full = np.repeat(wa[:, :, None], 128, axis=2)      # (k2cov, n2, 128)
    tw = np.exp(2j * np.pi * np.outer(np.arange(n2), k1) / nfft)
    wb = np.exp(2j * np.pi * np.outer(k1, np.arange(128)) / 128.0) / nfft
    f32 = np.float32
    return (wa_full.real.astype(f32), wa_full.imag.astype(f32),
            tw.real.astype(f32), tw.imag.astype(f32),
            wb.real.astype(f32), wb.imag.astype(f32))


def _analyze_block(prev_all, cur_all, w1r, w1i, twr, twi, wlo, whi,
                   m: int, n2: int, k2cov: int, nfft: int, fb: int):
    """Frame-BATCHED fused WOLA analysis: all fb frames of a grid step go
    through one set of wide ops (per-frame small ops are issue-overhead
    bound on the VPU — batching frames onto the untiled leading dim
    amortizes ~8x). prev_all/cur_all (fb*n2*m, 64) stride-layout hop
    streams (frame f's halves); row consts keep their natural (n2*m, .)
    shape and broadcast over frames. Returns
    (spec_r, spec_i (fb, m, k2cov*128), mag (fb, 1, k2cov*128))."""
    minv = np.float32(1.0 / (m * nfft))
    # window/twiddle rows stay at their natural (n2*m, .) shape in VMEM and
    # broadcast over the frame axis via free leading-dim reshapes (host-side
    # fb-tiling of these consts cost ~3 MB and pushed the kernel over the
    # scoped-VMEM cliff at production shapes); w1r/w1i arrive as stacked
    # (2, 128, 128) bf16 hi/lo pairs for the 3-pass dots (see _dot3)
    p = (prev_all.reshape(fb, n2 * m, 64) * wlo).reshape(fb * n2 * m, 64)
    c = (cur_all.reshape(fb, n2 * m, 64) * whi).reshape(fb * n2 * m, 64)
    f1r = _dot3(p, w1r[:, :64]) + _dot3(c, w1r[:, 64:])
    f1i = _dot3(p, w1i[:, :64]) + _dot3(c, w1i[:, 64:])
    f1r = f1r.reshape(fb, n2 * m, 128)
    f1i = f1i.reshape(fb, n2 * m, 128)
    gr = (f1r * twr - f1i * twi).reshape(fb, n2, m, 128)
    gi = (f1r * twi + f1i * twr).reshape(fb, n2, m, 128)
    spec_r, spec_i, mags = [], [], []
    for k2 in range(k2cov):
        acc_r = jnp.zeros((fb, m, 128), jnp.float32)
        acc_i = jnp.zeros((fb, m, 128), jnp.float32)
        for j in range(n2):
            w = np.exp(-2j * np.pi * (j * k2) / n2)
            acc_r, acc_i = _acc_term(acc_r, acc_i, gr[:, j], gi[:, j],
                                     float(np.float32(w.real)),
                                     float(np.float32(w.imag)))
        spec_r.append(acc_r)
        spec_i.append(acc_i)
        amag = jnp.sqrt(acc_r * acc_r + acc_i * acc_i)
        mags.append(jnp.sum(amag, axis=1, keepdims=True) * minv)
    return (jnp.concatenate(spec_r, axis=2), jnp.concatenate(spec_i, axis=2),
            jnp.concatenate(mags, axis=2))


def _synthesize_block(y_r, y_i, war, wai, s_twr, s_twi, wbr, wbi, win_s,
                      n2: int, k2cov: int, fb: int):
    """Frame-BATCHED half-spectrum inverse WOLA: y_r/y_i (fb, 1,
    k2cov*128) leading-bin spectra (bins >= k2cov*128 implicitly zero) ->
    windowed stride-layout frames (fb, n2, 128). Bin 0 is halved here; the
    Hermitian x2 lives in ``war/wai``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (fb, 1, k2cov * 128), 2)
    half0 = jnp.where(lane == 0, 0.5, 1.0)
    y_r = y_r * half0
    y_i = y_i * half0
    acc_r = jnp.zeros((fb, n2, 128), jnp.float32)
    acc_i = jnp.zeros((fb, n2, 128), jnp.float32)
    for c in range(k2cov):
        yc_r = y_r[:, :, c * 128:(c + 1) * 128]            # (fb, 1, 128)
        yc_i = y_i[:, :, c * 128:(c + 1) * 128]
        pr, pi = _cmul(yc_r, yc_i, war[c][None], wai[c][None])
        acc_r = acc_r + pr
        acc_i = acc_i + pi
    gr = ((acc_r * s_twr[None] - acc_i * s_twi[None])
          .reshape(fb * n2, 128))
    gi = ((acc_r * s_twi[None] + acc_i * s_twr[None])
          .reshape(fb * n2, 128))
    xr = _dot3(gr, wbr) - _dot3(gi, wbi)   # (2,128,128) bf16 hi/lo pairs
    return xr.reshape(fb, n2, 128) * win_s


def _mvdr_solve_frame(sr, si, ur, ui, linv_ref, solvers,
                      d_r, d_i, xc_r, xc_i, eyec, eye, m: int, refine: bool):
    """Loading + in-place Cholesky + (optionally refined) solve + apply:
    returns (y_r, y_i) (1, 1, nibp)."""
    fwd_solve, bwd_solve, refined_solve = solvers
    ur[:] = sr[:] * eyec
    ui[:] = si[:] * eyec
    cholesky_factor_inplace(ur, ui, linv_ref, m)
    if refine:
        u_r, u_i = refined_solve(sr, si, eye, d_r, d_i)
    else:
        zr_, zi_ = fwd_solve(d_r, d_i)
        u_r, u_i = bwd_solve(zr_, zi_)
    nr, ni = _cmul_conj(u_r, u_i, d_r, d_i)
    den_r = jnp.sum(nr, axis=1, keepdims=True)
    den_i = jnp.sum(ni, axis=1, keepdims=True)
    yr_, yi_ = _cmul_conj(xc_r, xc_i, u_r, u_i)
    num_r = jnp.sum(yr_, axis=1, keepdims=True)
    num_i = jnp.sum(yi_, axis=1, keepdims=True)
    # den == 0 -> 0: MVDR's own steering vectors are unit-modulus (den=0
    # unreachable), but s_cap==1 LCMV routes through this body and an
    # all-zero constraint column must yield 0 exactly like
    # constraint_space_apply's guard, not NaN
    d2 = den_r * den_r + den_i * den_i
    scale = jnp.where(d2 > 0.0, 1.0 / jnp.maximum(d2, 1e-38), 0.0)
    return ((num_r * den_r - num_i * den_i) * scale,
            (num_i * den_r + num_r * den_i) * scale)


def _lcmv_solve_frame(sr, si, ur, ui, xsr, xsi, linv_ref, solvers,
                      c_rows_r, c_rows_i, xc_r, xc_i, eyec, eye,
                      m: int, s_cap: int, refine: bool):
    """Loading + in-place Cholesky, then the SHARED constraint-space core
    (kernels/lcmv_stream.py constraint_space_apply — one copy of the
    lcmv.cpp:108-138 algebra for both kernels)."""
    ur[:] = sr[:] * eyec
    ui[:] = si[:] * eyec
    cholesky_factor_inplace(ur, ui, linv_ref, m)
    return constraint_space_apply(solvers, sr, si, eye, xsr, xsi,
                                  c_rows_r, c_rows_i, xc_r, xc_i,
                                  m, s_cap, refine)


def _kernel(hops_ref, init_hop_ref, hist_r_ref, hist_i_ref,
            ctrl_r_ref, ctrl_i_ref, mask_ref,
            w1r_ref, w1i_ref, twr_ref, twi_ref, wlo_ref, whi_ref,
            war_ref, wai_ref, stwr_ref, stwi_ref, wbr_ref, wbi_ref,
            wins_ref,
            out_ref, ring_out_r, ring_out_i, ola_out_ref,
            sr, si, gr, gi, ur, ui, linv_ref,
            ring_r, ring_i, ring_c_r, ring_c_i, prev_hop, ola,
            *extra_scratch,
            m: int, n2: int, k2cov: int, nfft: int, w_hist: int, fb: int,
            t_real: int, s_cap: int, per_frame_ctrl: bool, refine: bool,
            mag_threshold: float, kind: str, solve_group: int):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    nibp = k2cov * 128
    sg = solve_group
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m, nibp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m, nibp), 1)
    eye = (rows == cols).astype(jnp.float32)
    eyec = 1.0 + 0.001 * eye
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nibp), 2)
    # ur/ui/linv are sg-fold wide on lanes when solves are grouped; the
    # solver closures are lane-elementwise, so one wide chain IS sg
    # per-frame chains run in lockstep
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, m, sg * nibp), 1)
    solvers = make_solvers(ur, ui, linv_ref, sub, m)
    w32 = np.int32(w_hist)
    mvdr_form = kind == "mvdr" or s_cap == 1

    @pl.when(step == 0)
    def _prologue():
        sr[:] = jnp.zeros(sr.shape, jnp.float32)
        si[:] = jnp.zeros(si.shape, jnp.float32)
        gr[:] = jnp.zeros(gr.shape, jnp.float32)
        gi[:] = jnp.zeros(gi.shape, jnp.float32)
        ring_r[:] = jnp.zeros(ring_r.shape, jnp.float32)
        ring_i[:] = jnp.zeros(ring_i.shape, jnp.float32)
        prev_hop[:] = init_hop_ref[0].reshape(n2 * m, 64)
        ola[:] = jnp.zeros(ola.shape, jnp.float32)
        # warm-up: replay the W carried history frames as covariance
        # updates (solves gated off) — the mvdr_stream.py prepended-frame
        # trick, done once in VMEM. The column-layout ring is rebuilt here
        # too (it is scratch; only the row ring round-trips between
        # segment launches).
        for w in range(w_hist):
            h_r = hist_r_ref[w:w + 1]
            h_i = hist_i_ref[w:w + 1]
            hc_r, hc_i = _col_from_row(h_r, h_i, m)
            sliding_update_cols(sr, si, gr, gi, hc_r, hc_i, h_r, h_i,
                                ring_c_r[w * m:(w + 1) * m],
                                ring_c_i[w * m:(w + 1) * m],
                                ring_r[w:w + 1], ring_i[w:w + 1], True)
            ring_r[w:w + 1] = h_r
            ring_i[w:w + 1] = h_i
            ring_c_r[w * m:(w + 1) * m] = hc_r
            ring_c_i[w * m:(w + 1) * m] = hc_i

    # ---- frame-BATCHED analysis: all fb frames in wide ops --------------
    cur_all = hops_ref[...].reshape(fb * n2 * m, 64)
    prev_all = jnp.concatenate(
        [prev_hop[:], cur_all[:(fb - 1) * n2 * m]], axis=0)
    spec_r, spec_i, mag = _analyze_block(
        prev_all, cur_all, w1r_ref[:], w1i_ref[:], twr_ref[:], twi_ref[:],
        wlo_ref[:], whi_ref[:], m, n2, k2cov, nfft, fb)
    prev_hop[:] = cur_all[(fb - 1) * n2 * m:]
    gate_all = ((mag > mag_threshold)
                & (mask_ref[:] != 0.0))                    # (fb, 1, nibp)

    ysr, ysi = (extra_scratch[-2], extra_scratch[-1])      # (fb, 1, nibp)

    # block-batched column extraction: 2 x M concat-slices ONCE for all fb
    # frames instead of per frame (the march's small-op overhead was ~40%
    # of the non-solve wall per the round-5 attribution)
    roww_r = jnp.concatenate([spec_r[f:f + 1] for f in range(fb)], axis=2)
    roww_i = jnp.concatenate([spec_i[f:f + 1] for f in range(fb)], axis=2)
    colw_r, colw_i = _col_from_row(roww_r, roww_i, m)  # (m, 1, fb*nibp)

    def epoch_reset(t):
        """Epoch-exact covariance window reset; global frame index =
        w_hist + t (warm-ups count, matching the three-stage kernel).
        Must run BEFORE the frame's solve/snapshot (the original per-frame
        order: reset, solve, update)."""
        @pl.when(jax.lax.rem(w32 + t, w32) == 0)
        def _():
            sr[:] = gr[:]
            si[:] = gi[:]
            gr[:] = jnp.zeros(gr.shape, jnp.float32)
            gi[:] = jnp.zeros(gi.shape, jnp.float32)

    def slide(f, t):
        """Sliding-window update (history shifts regardless of the gate,
        mvdr.cpp:100-101): remove the frame W back from the VMEM ring,
        insert the current frame — column-layout vectors precomputed."""
        xc_r = spec_r[f:f + 1]
        xc_i = spec_i[f:f + 1]
        slot = jax.lax.rem(t, w32)
        cc_r = colw_r[:, :, f * nibp:(f + 1) * nibp]
        cc_i = colw_i[:, :, f * nibp:(f + 1) * nibp]
        old_r = ring_r[pl.ds(slot, 1)]
        old_i = ring_i[pl.ds(slot, 1)]
        oldc_r = ring_c_r[pl.ds(slot * m, m)]
        oldc_i = ring_c_i[pl.ds(slot * m, m)]
        sliding_update_cols(sr, si, gr, gi, cc_r, cc_i, xc_r, xc_i,
                            oldc_r, oldc_i, old_r, old_i, True)
        ring_r[pl.ds(slot, 1)] = xc_r
        ring_i[pl.ds(slot, 1)] = xc_i
        ring_c_r[pl.ds(slot * m, m)] = cc_r
        ring_c_i[pl.ds(slot * m, m)] = cc_i

    if sg > 1:
        # ---- grouped march + lane-wide solve, sg frames per chain ------
        assert mvdr_form and not refine
        for p in range(fb // sg):
            for g in range(sg):
                f = p * sg + g
                t = step * fb + f

                @pl.when(t < t_real)
                def _frame():
                    epoch_reset(t)
                    # load R = S .* whiteR for this frame into its lane
                    # segment of the wide factorization scratch (the solve
                    # runs after the group's covariance marches; the
                    # snapshot keeps it exact: R is the covariance of the
                    # W frames BEFORE t, mvdr.cpp:87)
                    ur[:, :, g * nibp:(g + 1) * nibp] = sr[:] * eyec
                    ui[:, :, g * nibp:(g + 1) * nibp] = si[:] * eyec
                    slide(f, t)

            f0 = p * sg
            # padded frames' gates are all-False (zero hops), so the group
            # act covers exactly the real frames; a group whose frames are
            # all silent (or all pad) skips the whole factor+solve chain
            g_gate = gate_all[f0:f0 + sg]
            g_act = jnp.sum(g_gate.astype(jnp.float32)) > 0.0

            @pl.when(g_act)
            def _solve_group():
                d_r = jnp.concatenate(
                    [ctrl_r_ref[f0 + g if per_frame_ctrl else 0, 0:1]
                     for g in range(sg)], axis=2)          # (1, m, sg*nibp)
                d_i = jnp.concatenate(
                    [ctrl_i_ref[f0 + g if per_frame_ctrl else 0, 0:1]
                     for g in range(sg)], axis=2)
                x_r = jnp.concatenate(
                    [spec_r[f0 + g:f0 + g + 1] for g in range(sg)], axis=2)
                x_i = jnp.concatenate(
                    [spec_i[f0 + g:f0 + g + 1] for g in range(sg)], axis=2)
                cholesky_factor_inplace(ur, ui, linv_ref, m)
                fwd_solve, bwd_solve, _ = solvers
                zr_, zi_ = fwd_solve(d_r, d_i)
                u_r, u_i = bwd_solve(zr_, zi_)
                nr, ni = _cmul_conj(u_r, u_i, d_r, d_i)
                den_r = jnp.sum(nr, axis=1, keepdims=True)
                den_i = jnp.sum(ni, axis=1, keepdims=True)
                yr_, yi_ = _cmul_conj(x_r, x_i, u_r, u_i)
                num_r = jnp.sum(yr_, axis=1, keepdims=True)
                num_i = jnp.sum(yi_, axis=1, keepdims=True)
                d2 = den_r * den_r + den_i * den_i
                scale = jnp.where(d2 > 0.0,
                                  1.0 / jnp.maximum(d2, 1e-38), 0.0)
                y_r = (num_r * den_r - num_i * den_i) * scale
                y_i = (num_i * den_r + num_r * den_i) * scale
                for g in range(sg):
                    ysr[f0 + g:f0 + g + 1] = (
                        y_r[:, :, g * nibp:(g + 1) * nibp])
                    ysi[f0 + g:f0 + g + 1] = (
                        y_i[:, :, g * nibp:(g + 1) * nibp])

            @pl.when(jnp.logical_not(g_act))
            def _silent_group():
                ysr[f0:f0 + sg] = jnp.zeros((sg, 1, nibp), jnp.float32)
                ysi[f0:f0 + sg] = jnp.zeros((sg, 1, nibp), jnp.float32)
    else:
        # ---- per-frame march + solve (multi-slot LCMV, refine) ----------
        for f in range(fb):
            t = step * fb + f

            @pl.when(t < t_real)
            def _frame():
                xc_r = spec_r[f:f + 1]                     # (1, m, nibp)
                xc_i = spec_i[f:f + 1]
                gate = gate_all[f:f + 1]
                act = jnp.sum(gate.astype(jnp.float32)) > 0.0
                epoch_reset(t)

                fi = f if per_frame_ctrl else 0
                # LCMV with a single active constraint slot IS the MVDR
                # formula (lcmv.cpp's constraint-space algebra at S=1
                # reduces to w = R^-1 c / (c^H R^-1 c); the inner product
                # is a real Hermitian form, so the conjugate orientation
                # difference is f32 noise) — route it through the MVDR
                # solve body, which is the substantially smaller Mosaic
                # program
                if mvdr_form:
                    d_r = ctrl_r_ref[fi, 0:1]
                    d_i = ctrl_i_ref[fi, 0:1]
                else:
                    c_rows_r = [ctrl_r_ref[fi, a:a + 1, :, :]
                                for a in range(s_cap)]
                    c_rows_i = [ctrl_i_ref[fi, a:a + 1, :, :]
                                for a in range(s_cap)]

                # the solve only runs on gate-passing frames (the
                # reference's per-bin energy-gate sparsity at frame
                # granularity); its result lands in scratch rows so the
                # batched masked combine below is branch-free. It must run
                # BEFORE this frame's sliding update (R is the covariance
                # of the W frames before t, mvdr.cpp:87).
                @pl.when(act)
                def _solve():
                    if mvdr_form:
                        r_, i_ = _mvdr_solve_frame(
                            sr, si, ur, ui, linv_ref, solvers,
                            d_r, d_i, xc_r, xc_i, eyec, eye, m, refine)
                    else:
                        xsr, xsi = extra_scratch[0], extra_scratch[1]
                        r_, i_ = _lcmv_solve_frame(
                            sr, si, ur, ui, xsr, xsi, linv_ref,
                            solvers, c_rows_r, c_rows_i, xc_r, xc_i, eyec,
                            eye, m, s_cap, refine)
                    ysr[f:f + 1] = r_
                    ysi[f:f + 1] = i_

                @pl.when(jnp.logical_not(act))
                def _silent():
                    ysr[f:f + 1] = jnp.zeros((1, 1, nibp), jnp.float32)
                    ysi[f:f + 1] = jnp.zeros((1, 1, nibp), jnp.float32)

                slide(f, t)

    # ---- batched per-bin combine (mvdr.cpp:76,96) -----------------------
    x0_r = spec_r[:, 0:1, :]                               # (fb, 1, nibp)
    x0_i = spec_i[:, 0:1, :]
    in_band = mask_ref[:] != 0.0
    y_r = jnp.where(gate_all, ysr[:], jnp.where(in_band, 0.01 * x0_r, 0.0))
    y_i = jnp.where(gate_all, ysi[:], jnp.where(in_band, 0.01 * x0_i, 0.0))
    y_r = jnp.where(lane == 0, x0_r, y_r)
    y_i = jnp.where(lane == 0, x0_i, y_i)

    # ---- frame-BATCHED synthesis + in-block overlap-add -----------------
    p = _synthesize_block(y_r, y_i, war_ref[:], wai_ref[:],
                          stwr_ref[:], stwi_ref[:], wbr_ref[:], wbi_ref[:],
                          wins_ref[:], n2, k2cov, fb)
    first = p[:, :, :64]                                   # (fb, n2, 64)
    second = p[:, :, 64:]
    prev_block = jnp.concatenate([ola[:][None], second[:fb - 1]], axis=0)
    out_ref[...] = first + prev_block
    # the carry out is the last VALID frame's second half (the trailing
    # pad frames of the final block must not shift it)
    nvalid = jnp.clip(t_real - step * fb, 1, fb)
    frow = jax.lax.broadcasted_iota(jnp.int32, (fb, n2, 64), 0)
    sel = (frow == nvalid - 1).astype(jnp.float32)
    ola[:] = jnp.sum(second * sel, axis=0)

    @pl.when(step == nsteps - 1)
    def _epilogue():
        ring_out_r[:] = ring_r[:]
        ring_out_i[:] = ring_i[:]
        ola_out_ref[:] = ola[:]


def _mega_call(hs, hist_r, hist_i, ctrl_r, ctrl_i, band_mask,
               nfft: int, w_hist: int, mag_threshold: float, kind: str,
               refine: bool, interpret: bool, frames_per_step: int):
    """Shared pallas_call wrapper. hs (T+1, n2, m, 64) stride hops (hs[0]
    is the carried tail hop); hist (W, m, nibp) planes; ctrl (U, S, m,
    nibp) planes with S=1 for mvdr (U==1 constant control, else U==T
    pre-gathered); band_mask (1, 1, nibp) f32 0/1. Returns (audio
    (tp, n2, 64) stride frames, ring planes (W, m, nibp) x2 — slot j holds
    frame T-W+((T+j) mod W)... i.e. frame t at slot t mod W — and the OLA
    carry (n2, 64))."""
    t = hs.shape[0] - 1
    n2 = nfft // 128
    m = hs.shape[2]
    nibp = band_mask.shape[-1]
    k2cov = nibp // 128
    fb = int(os.environ.get("BEAMFORM_MEGA_FB", frames_per_step))
    tp = -(-t // fb) * fb
    u, s_cap = ctrl_r.shape[:2]
    per_frame_ctrl = u > 1
    # lane-grouped solves: MVDR-form only (see SOLVE_GROUP), refine off,
    # group dividing the frame block
    sg = int(os.environ.get("BEAMFORM_MEGA_GROUP", SOLVE_GROUP))
    if not (kind == "mvdr" or s_cap == 1) or refine or fb % max(sg, 1):
        sg = 1
    sg = max(sg, 1)

    w1r, w1i, twr, twi, win_lo, win_hi, _ = _fwd_consts(nfft, m)
    war, wai, stwr, stwi, wbr, wbi = _synth_consts(nfft, k2cov)
    # the stage-1 / stage-B DFT matrices feed 3-pass bf16 dots (_dot3)
    w1r, w1i = _bf16_pair(w1r), _bf16_pair(w1i)
    wbr, wbi = _bf16_pair(wbr), _bf16_pair(wbi)
    from beamform_tpu.dsp.wola import sqrt_hann
    win_s = sqrt_hann(nfft, np.float32).reshape(128, n2).T  # (n2, 128)

    hops = jnp.pad(hs[1:], ((0, tp - t), (0, 0), (0, 0), (0, 0)))
    if per_frame_ctrl:
        zp = jnp.zeros((tp - t,) + ctrl_r.shape[1:], ctrl_r.dtype)
        ctrl_r = jnp.concatenate([ctrl_r, zp], axis=0)
        ctrl_i = jnp.concatenate([ctrl_i, zp], axis=0)
        ctrl_spec = pl.BlockSpec((fb, s_cap, m, nibp),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        ctrl_spec = pl.BlockSpec((1, s_cap, m, nibp), lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, m=m, n2=n2, k2cov=k2cov, nfft=nfft, w_hist=w_hist, fb=fb,
        t_real=t, s_cap=s_cap, per_frame_ctrl=per_frame_ctrl, refine=refine,
        mag_threshold=float(mag_threshold), kind=kind, solve_group=sg)

    lcmv_scratch = ([pltpu.VMEM((s_cap, m, nibp), jnp.float32)] * 2
                    if kind == "lcmv" and s_cap > 1 else [])
    outs = pl.pallas_call(
        kernel,
        grid=(tp // fb,),
        in_specs=[
            pl.BlockSpec((fb, n2, m, 64), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, n2, m, 64)),
            const((w_hist, m, nibp)), const((w_hist, m, nibp)),
            ctrl_spec, ctrl_spec,
            const((1, 1, nibp)),
            const((2, 128, 128)), const((2, 128, 128)),
            const((n2 * m, 128)), const((n2 * m, 128)),
            const((n2 * m, 64)), const((n2 * m, 64)),
            const((k2cov, n2, 128)), const((k2cov, n2, 128)),
            const((n2, 128)), const((n2, 128)),
            const((2, 128, 128)), const((2, 128, 128)),
            const((n2, 128)),
        ],
        out_specs=[
            pl.BlockSpec((fb, n2, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((w_hist, m, nibp)), const((w_hist, m, nibp)),
            const((n2, 64)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, n2, 64), jnp.float32),
            jax.ShapeDtypeStruct((w_hist, m, nibp), jnp.float32),
            jax.ShapeDtypeStruct((w_hist, m, nibp), jnp.float32),
            jax.ShapeDtypeStruct((n2, 64), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((m, m, nibp), jnp.float32)] * 4        # sr si gr gi
            + [pltpu.VMEM((m, m, sg * nibp), jnp.float32)] * 2  # ur ui
            + [pltpu.VMEM((m, 1, sg * nibp), jnp.float32)]      # linv
            + [pltpu.VMEM((w_hist, m, nibp), jnp.float32)] * 2  # row ring
            + [pltpu.VMEM((w_hist * m, 1, nibp), jnp.float32)] * 2  # col
            + [pltpu.VMEM((n2 * m, 64), jnp.float32)]
            + [pltpu.VMEM((n2, 64), jnp.float32)]
            + lcmv_scratch
            + [pltpu.VMEM((fb, 1, nibp), jnp.float32)] * 2
        ),
        # 32 MB scoped-VMEM ceiling (v5e has 128 MiB): at production shapes
        # (16 ch, 678-bin band, W=10) the LCMV variant's scoped set incl.
        # Mosaic stack spill is ~24.3 MB — just over the 24 MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "BEAMFORM_MEGA_VMEM", 32 * 1024 * 1024)),
            internal_scratch_in_bytes=int(os.environ.get(
                "BEAMFORM_MEGA_ISCRATCH", 0)) or None),
        interpret=interpret,
    )(hops, hs[0:1], hist_r, hist_i, ctrl_r, ctrl_i, band_mask,
      jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(win_lo), jnp.asarray(win_hi),
      jnp.asarray(war), jnp.asarray(wai), jnp.asarray(stwr),
      jnp.asarray(stwi), jnp.asarray(wbr), jnp.asarray(wbi),
      jnp.asarray(win_s))
    audio, ring_r, ring_i, ola = outs
    return audio[:t], ring_r, ring_i, ola


def _mega_segments(hs, hist_r, hist_i, ctrl_r, ctrl_i, band_mask,
                   nfft: int, w_hist: int, mag_threshold: float, kind: str,
                   refine: bool, interpret: bool, frames_per_step: int):
    """Chain ≤SEG_FRAMES-frame pallas launches over the full stream: each
    segment's leading hop is the previous segment's last hop (hs packs the
    carry at index 0), the covariance ring planes roll to oldest-first
    between launches (the same layout the in-kernel warm-up replays), and
    the OLA half-frame folds into the next segment's first output row.
    Identical arithmetic to the chunked model path (tests pin chunked ==
    offline). Returns (audio (t, n2, 64), ring planes OLDEST-FIRST x2,
    ola carry (n2, 64))."""
    t = hs.shape[0] - 1
    seg = int(os.environ.get("BEAMFORM_MEGA_SEG", SEG_FRAMES))
    per_frame = ctrl_r.shape[0] > 1
    audios = []
    rr, ri = hist_r, hist_i
    ola = None
    for s0 in range(0, t, seg):
        s1 = min(t, s0 + seg)
        cr = ctrl_r[s0:s1] if per_frame else ctrl_r
        ci = ctrl_i[s0:s1] if per_frame else ctrl_i
        audio, ring_r, ring_i, ola_n = _mega_call(
            hs[s0:s1 + 1], rr, ri, cr, ci, band_mask, nfft, w_hist,
            mag_threshold, kind, refine, interpret, frames_per_step)
        if ola is not None:
            audio = audio.at[0].add(ola)
        audios.append(audio)
        rr = jnp.roll(ring_r, -((s1 - s0) % w_hist), axis=0)
        ri = jnp.roll(ring_i, -((s1 - s0) % w_hist), axis=0)
        ola = ola_n
    return (audios[0] if len(audios) == 1 else
            jnp.concatenate(audios, axis=0)), rr, ri, ola


def mega_k2cov(ib) -> int:
    """128-bin groups covering [bin 0, last in-band bin]."""
    return (int(np.max(ib)) + 128) // 128


def mega_fits(m: int, ib, nfft: int, s_cap: int = 0, w_hist: int = 16,
              budget: int = 18 * 1024 * 1024) -> bool:
    """Whether the mega kernel can take this configuration on-core.

    Two gates: (1) the half-spectrum synthesis doubles every bin
    0 < k < nfft/2 via the Hermitian fold, so a band that reaches the
    Nyquist bin (or its extended shadow bin) would double-count it —
    those bands stay on the three-stage path, whose synthesis performs
    the exact extended-layout fold; (2) the VMEM scratch set (mirrors
    models/mvdr.py stream_solver_fits plus the fused extras: the W-frame
    spectra ring + hist/ring blocks scale with ``w_hist``, the per-frame
    LCMV control blocks and fb-row ysr/ysi scratch scale with the
    effective fb — including the BEAMFORM_MEGA_FB override — hop scratch,
    band-coverage padding nibp = k2cov*128) must fit the budget."""
    from beamform_tpu.kernels.wola_pallas import MAX_CHANNELS_PER_BLOCK
    if m > MAX_CHANNELS_PER_BLOCK:
        return False
    if int(np.max(ib)) >= nfft // 2:     # Nyquist / shadow bin in band
        return False
    nibp = mega_k2cov(ib) * 128
    n2 = nfft // 128
    fb = int(os.environ.get("BEAMFORM_MEGA_FB", FRAMES_PER_STEP))
    sg = int(os.environ.get("BEAMFORM_MEGA_GROUP", SOLVE_GROUP))
    if s_cap > 1 or fb % max(sg, 1):
        sg = 1
    # covariance scratch (4) + sg-wide factorization scratch (2 + linv),
    # row ring (2) + COLUMN ring (2, same footprint) + hist inputs (2) +
    # ring outputs (2), all nibp-lane planes
    scratch = ((4 + 2 * sg) * m * m + sg * m
               + 8 * w_hist * m + 2 * s_cap * m) * nibp * 4
    # worst case per-frame control planes (fb, S, M, NIBP) x2, both
    # double-buffered, + the fb-row combine scratch
    scratch += (4 * fb * s_cap * m + 2 * fb) * nibp * 4
    scratch += (n2 * m * 64 + n2 * 64) * 4
    return scratch <= budget


def _prep(x, tail, hist, ib, nfft: int):
    """Host-side prep shared by both wrappers: stride hops + padded
    history planes + band mask."""
    m, s = x.shape
    n2 = nfft // 128
    hop = nfft // 2
    t = s // hop
    nibp = mega_k2cov(ib) * 128
    ext = jnp.concatenate([jnp.asarray(tail, x.dtype), x], axis=-1)
    hs = jnp.transpose(ext.reshape(m, t + 1, 64, n2), (1, 3, 0, 2))
    ibj = jnp.asarray(np.asarray(ib))
    w_hist = hist.shape[0]
    hist_p = jnp.zeros((w_hist, m, nibp), jnp.float32)
    hist_r = hist_p.at[..., ibj].set(hist.real.astype(jnp.float32))
    hist_i = hist_p.at[..., ibj].set(hist.imag.astype(jnp.float32))
    mask = np.zeros((1, 1, nibp), np.float32)
    mask[0, 0, np.asarray(ib)] = 1.0
    return hs, hist_r, hist_i, jnp.asarray(mask), t, nibp, hop


def _finish(audio, ring_r, ring_i, ola, ib, t: int, hop: int,
            out_prev, n2: int):
    """De-stride the audio, fold the initial OLA carry into hop 0, select
    the in-band bins of the (already oldest-first) history planes,
    de-stride the carry."""
    prev_s = jnp.transpose(jnp.asarray(out_prev, jnp.float32)
                           .reshape(64, n2))               # (n2, 64)
    audio = audio.at[0].add(prev_s)
    stream = jnp.transpose(audio, (0, 2, 1)).reshape(t * hop)
    hist = jax.lax.complex(ring_r, ring_i)[..., jnp.asarray(np.asarray(ib))]
    new_prev = jnp.transpose(ola).reshape(hop)
    return stream, hist, new_prev


def mvdr_mega(x, tail, out_prev, hist, d_ib, w_idx, ib, nfft: int,
              w_hist: int, mag_threshold: float, refine: bool = False,
              interpret: bool = False,
              frames_per_step: int = FRAMES_PER_STEP):
    """Fused MVDR step: x (M, S) audio, tail (M, hop) analysis carry,
    out_prev (hop,) OLA carry, hist (W, M, NIB) complex history, d_ib
    (U, M, NIB) complex steering over the in-band bins ``ib``; w_idx (T,)
    steering index per frame. Returns (audio (S,), hist', out_prev')."""
    if x.shape[1] < nfft // 2:           # no whole hop: nothing to march
        return (jnp.zeros((0,), jnp.float32), jnp.asarray(hist),
                jnp.asarray(out_prev, jnp.float32))
    hs, hist_r, hist_i, mask, t, nibp, hop = _prep(x, tail, hist, ib, nfft)
    n2 = nfft // 128
    ibj = jnp.asarray(np.asarray(ib))
    u = d_ib.shape[0]
    d_p = jnp.zeros((u, 1, d_ib.shape[1], nibp), jnp.float32)
    d_r = d_p.at[..., ibj].set(d_ib.real[:, None].astype(jnp.float32))
    d_i = d_p.at[..., ibj].set(d_ib.imag[:, None].astype(jnp.float32))
    if u > 1:
        d_r, d_i = d_r[w_idx], d_i[w_idx]
    audio, ring_r, ring_i, ola = _mega_segments(
        hs, hist_r, hist_i, d_r, d_i, mask, nfft, w_hist, mag_threshold,
        "mvdr", refine, interpret, frames_per_step)
    return _finish(audio, ring_r, ring_i, ola, ib, t, hop, out_prev, n2)


def lcmv_mega(x, tail, out_prev, hist, c_ib, idx, ib, nfft: int,
              w_hist: int, mag_threshold: float, refine: bool = False,
              interpret: bool = False,
              frames_per_step: int = FRAMES_PER_STEP):
    """Fused LCMV step: c_ib (U, S_cap, M, NIB) complex constraint sets
    (inactive slots all-zero, detected in-kernel per bin); idx (T,)
    control-row index per frame. Returns (audio (S,), hist', out_prev')."""
    if x.shape[1] < nfft // 2:           # no whole hop: nothing to march
        return (jnp.zeros((0,), jnp.float32), jnp.asarray(hist),
                jnp.asarray(out_prev, jnp.float32))
    hs, hist_r, hist_i, mask, t, nibp, hop = _prep(x, tail, hist, ib, nfft)
    n2 = nfft // 128
    ibj = jnp.asarray(np.asarray(ib))
    u, s_cap = c_ib.shape[:2]
    c_p = jnp.zeros((u, s_cap, c_ib.shape[2], nibp), jnp.float32)
    c_r = c_p.at[..., ibj].set(c_ib.real.astype(jnp.float32))
    c_i = c_p.at[..., ibj].set(c_ib.imag.astype(jnp.float32))
    if u > 1:
        c_r, c_i = c_r[idx], c_i[idx]
    audio, ring_r, ring_i, ola = _mega_segments(
        hs, hist_r, hist_i, c_r, c_i, mask, nfft, w_hist, mag_threshold,
        "lcmv", refine, interpret, frames_per_step)
    return _finish(audio, ring_r, ring_i, ola, ib, t, hop, out_prev, n2)
