"""Fused WOLA analysis/synthesis Pallas kernels.

The MXU-FFT module (kernels/mxu_fft.py) beats XLA's FFT lowering ~2x, but
its stage-2 matmul contracts only N2 = nfft/128 elements — a [F*128, N2] @
[N2, K2] matmul at ~1% MXU utilization that XLA materializes through HBM,
plus separate framing / windowing / twiddle passes. These kernels fuse the
whole WOLA boundary:

analysis (``rfft_hops_pallas``):
  NON-overlapping stride-layout hops -> frame assembly by contracting the
  previous/current hop halves against the split stage-1 DFT matrix (two
  MXU dots; the sqrt-Hann window halves are folded into per-half kernel
  constants), twiddle, stage-2 N2-point DFT as unrolled VPU constant-MACs
  in VMEM (zero/unit twiddles skipped), plus the energy-gate magnitude
  (mean |X| / (M * nfft), mvdr.cpp:79-82) reduced in-register — each hop
  is read once (no 50%-overlap duplication), one write of the spectra.

  The natural K2MAX*128-bin output is the full-DFT prefix, so the extended
  layout's shadow bin (conj(X[h-1]) at h+1 — see models/common.py) is
  already sitting at bin h+1: the caller just slices [:h+2].

synthesis (``irfft_ola_pallas``):
  Hermitian-expanded spectra -> stage-A N2-point inverse DFT (VPU
  constant-MACs), twiddle, stage-B 128-point inverse DFT as one MXU dot,
  synthesis window, and the 50% overlap-add with its one-hop carry held in
  VMEM scratch across the sequential grid — the carry IS the WolaCarry
  ``out_prev`` state (util.h:284-302 semantics).

Both kernels keep time samples in the stride layout x[N2*n1 + n2] <->
[n2 rows, n1 lanes]; the conversions are single XLA transposes outside the
kernels (HBM-bandwidth cheap, and XLA fuses the window multiply into them).

Same DFT constants as kernels/mxu_fft.py — agreement with jnp.fft is at f32
round-off (~1e-6 relative); the float64 parity path (CPU, jnp.fft) is
untouched.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES_PER_STEP = 8
_HP = jax.lax.Precision.HIGHEST   # used off-kernel; in-kernel dots are _dot3


def _bf16_pair(w: np.ndarray) -> np.ndarray:
    """Split an f32 matrix into a stacked (2, ...) bf16 hi/lo pair for the
    3-pass MXU dot (numpy, jit-capture-safe)."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(np.float32)).astype(jnp.bfloat16)
    return np.stack([np.asarray(hi), np.asarray(lo)])


def _dot3(a, w_pair):
    """~f32 matmul in 3 bf16 MXU passes: a (R, K) f32, w_pair (2, K, N)
    bf16 hi/lo. Mosaic's pallas dots only support DEFAULT (1-pass bf16,
    ~2e-2 relative here) or HIGHEST (6-pass f32); the explicit
    hi*hi + hi*lo + lo*hi split drops only the lo*lo term (~2^-18
    relative, well inside the kernels' 1e-5 test budget vs the rFFT
    path), at half of HIGHEST's MXU time.

    NOTE (round-3 advisor): switching these shared WOLA kernels to _dot3
    lowered the pre-existing three-stage stream path's precision from
    HIGHEST to the same ~2^-18 budget, not only the mega kernel's — the
    change is deliberate and covered by the stream kernels' deviation
    tests (test_wola_pallas.py, test_mvdr_stream.py budgets) and the
    on-chip oracle sweep (tools/tpu_deviation_sweep.py)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jax.lax.dot,
                          preferred_element_type=jnp.float32)
    return d(a_hi, w_pair[0]) + (d(a_lo, w_pair[0]) + d(a_hi, w_pair[1]))


@lru_cache(maxsize=8)
def _fwd_consts(nfft: int, m: int):
    n2 = nfft // 128
    k2max = (nfft // 2 + 1 + 127) // 128
    k1 = np.arange(128)
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(128), k1) / 128.0)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n2), k1) / nfft)
    # rows n2*m + mic -> twiddle depends on n2 only
    tw_rows = np.repeat(tw, m, axis=0)                    # (n2*m, 128)
    # the sqrt-Hann analysis window in the per-hop stride layout: value at
    # (row n2*m+mic, lane n1) is win[N2*n1 + n2] for the first half of the
    # frame (n1 < 64) and win[N2*(64+n1) + n2] for the second
    from beamform_tpu.dsp.wola import sqrt_hann
    win = sqrt_hann(nfft, np.float32).reshape(128, n2)    # [n1, n2]
    win_lo = np.repeat(win[:64].T, m, axis=0)             # (n2*m, 64)
    win_hi = np.repeat(win[64:].T, m, axis=0)
    return (w1.real.astype(np.float32), w1.imag.astype(np.float32),
            tw_rows.real.astype(np.float32), tw_rows.imag.astype(np.float32),
            win_lo.astype(np.float32), win_hi.astype(np.float32), k2max)


def _acc_term(acc_r, acc_i, gr, gi, wr: float, wi: float):
    """acc += (gr + i gi) * (wr + i wi) with exact-constant folding."""
    if wi == 0.0:
        if wr == 1.0:
            return acc_r + gr, acc_i + gi
        if wr == -1.0:
            return acc_r - gr, acc_i - gi
        return acc_r + gr * wr, acc_i + gi * wr
    if wr == 0.0:
        if wi == 1.0:
            return acc_r - gi, acc_i + gr
        if wi == -1.0:
            return acc_r + gi, acc_i - gr
        return acc_r - gi * wi, acc_i + gr * wi
    return (acc_r + (gr * wr - gi * wi), acc_i + (gr * wi + gi * wr))


def _fwd_kernel(pv_ref, cu_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
                wlo_ref, whi_ref,
                sr_ref, si_ref, mag_ref,
                *, m: int, n2: int, k2max: int, fb: int, nfft: int,
                with_mag: bool):
    minv = np.float32(1.0 / (m * nfft))
    # the frame is [previous hop | current hop]; the halves stay separate
    # (a sub-tile lane concat would relayout) and stage 1 contracts each
    # against its half of the DFT matrix:
    # sum_n1 x[n1] W1[n1,k1] = sum_{n1<64} prev.. + sum_{n1>=64} cur..
    # All fb frames batch onto the untiled leading dim — per-frame (M, 128)
    # ops are issue-overhead bound (measured 8.6 ms -> 3.3 ms for a 30 s
    # 16-ch analysis); window/twiddle rows broadcast over the frame axis.
    p = (pv_ref[...].reshape(fb, n2 * m, 64) * wlo_ref[:]).reshape(
        fb * n2 * m, 64)
    c = (cu_ref[...].reshape(fb, n2 * m, 64) * whi_ref[:]).reshape(
        fb * n2 * m, 64)
    f1r = _dot3(p, w1r_ref[:, :64]) + _dot3(c, w1r_ref[:, 64:])
    f1i = _dot3(p, w1i_ref[:, :64]) + _dot3(c, w1i_ref[:, 64:])
    f1r = f1r.reshape(fb, n2 * m, 128)
    f1i = f1i.reshape(fb, n2 * m, 128)
    gr = (f1r * twr_ref[:] - f1i * twi_ref[:]).reshape(fb, n2, m, 128)
    gi = (f1r * twi_ref[:] + f1i * twr_ref[:]).reshape(fb, n2, m, 128)
    for k2 in range(k2max):
        acc_r = jnp.zeros((fb, m, 128), jnp.float32)
        acc_i = jnp.zeros((fb, m, 128), jnp.float32)
        for j in range(n2):
            w = np.exp(-2j * np.pi * (j * k2) / n2)
            acc_r, acc_i = _acc_term(acc_r, acc_i, gr[:, j], gi[:, j],
                                     float(np.float32(w.real)),
                                     float(np.float32(w.imag)))
        sr_ref[:, :, k2 * 128:(k2 + 1) * 128] = acc_r
        si_ref[:, :, k2 * 128:(k2 + 1) * 128] = acc_i
        if with_mag:
            amag = jnp.sqrt(acc_r * acc_r + acc_i * acc_i)
            mag_ref[:, 0:1, k2 * 128:(k2 + 1) * 128] = (
                jnp.sum(amag, axis=1, keepdims=True) * minv)


MAX_CHANNELS_PER_BLOCK = 32


def rfft_hops_pallas(hs, m: int, nfft: int, with_mag: bool = True,
                     interpret: bool = False,
                     frames_per_step: int = FRAMES_PER_STEP):
    """Forward DFT of stride-layout HOPS (no frame duplication).

    hs: (T+1, N2, M, 64) float32, hs[h, n2, mic, n1] = x[mic, hop h,
    sample N2*n1 + n2] — each hop appears once; frame t is
    [hop t | hop t+1] and the analysis window is applied in-kernel (a hop
    is the first half of one frame and the second half of the next, under
    different window halves). Returns (spec_r, spec_i (T, M, K2MAX*128),
    mag (T, K2MAX*128) or None): full-DFT bins — slice [:h+2] for the
    extended-rFFT layout.

    Wide channel counts (batched serving flattens B*M channels) are walked
    by a second grid dimension so the per-step VMEM block stays bounded;
    the cross-channel magnitude reduction only exists on the single-block
    path (its consumers are the M<=64 MVDR/LCMV pipelines).
    """
    t = hs.shape[0] - 1
    n2 = nfft // 128
    fb = frames_per_step
    tp = -(-t // fb) * fb
    mp = m
    gc = m
    if m > MAX_CHANNELS_PER_BLOCK:
        assert not with_mag, "fused magnitude needs all channels per block"
        gc = MAX_CHANNELS_PER_BLOCK
        mp = -(-m // gc) * gc
        hs = jnp.pad(hs, ((0, 0), (0, 0), (0, mp - m), (0, 0)))
    w1r, w1i, twr, twi, win_lo, win_hi, k2max = _fwd_consts(nfft, gc)
    pv = jnp.pad(hs[:t], ((0, tp - t), (0, 0), (0, 0), (0, 0)))
    cu = jnp.pad(hs[1:t + 1], ((0, tp - t), (0, 0), (0, 0), (0, 0)))
    nbp = k2max * 128

    kernel = functools.partial(_fwd_kernel, m=gc, n2=n2, k2max=k2max, fb=fb,
                               nfft=nfft, with_mag=with_mag)
    nchan = mp // gc
    const = lambda shape: pl.BlockSpec(shape, lambda i, c: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    hop_spec = pl.BlockSpec((fb, n2, gc, 64), lambda i, c: (i, 0, c, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(tp // fb, nchan),
        in_specs=[
            hop_spec, hop_spec,
            const((2, 128, 128)), const((2, 128, 128)),
            const((n2 * gc, 128)), const((n2 * gc, 128)),
            const((n2 * gc, 64)), const((n2 * gc, 64)),
        ],
        out_specs=[
            pl.BlockSpec((fb, gc, nbp), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, gc, nbp), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, 1, nbp), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, mp, nbp), jnp.float32),
            jax.ShapeDtypeStruct((tp, mp, nbp), jnp.float32),
            jax.ShapeDtypeStruct((tp, 1, nbp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(pv, cu, jnp.asarray(_bf16_pair(w1r)), jnp.asarray(_bf16_pair(w1i)),
      jnp.asarray(twr), jnp.asarray(twi),
      jnp.asarray(win_lo), jnp.asarray(win_hi))
    sr, si, mag = outs
    return (sr[:t, :m], si[:t, :m], mag[:t, 0] if with_mag else None)


def stft_planes(x, tail, window, engine, with_mag: bool = True,
                interpret: bool = False):
    """Streaming fused analysis: x (M, C*hop) + tail (M, hop) ->
    (spec_r, spec_i (T, M, NBP), mag (T, NBP) | None, new_tail).

    NBP = K2MAX*128 full-DFT bins; the extended layout is the [:h+2] prefix
    (the shadow bin conj(X[h-1]) IS full-DFT bin h+1). The only host-side
    prep is one stride transpose of the NON-overlapping hop stream (half
    the bytes of materialized 50%-overlap frames; windowing and the frame
    assembly happen in-kernel).
    """
    hop = engine.hop
    nfft = engine.fft_win
    m, s = x.shape
    t = s // hop
    n2 = nfft // 128
    ext = jnp.concatenate([jnp.asarray(tail, x.dtype), x], axis=-1)
    # stride layout per hop: sample N2*n1 + n2 -> [n2 rows, n1 lanes]
    hs = jnp.transpose(ext.reshape(m, t + 1, 64, n2), (1, 3, 0, 2))
    if isinstance(window, np.ndarray):
        from beamform_tpu.dsp.wola import sqrt_hann
        assert np.abs(window - sqrt_hann(nfft, window.dtype)).max() < 1e-6, \
            "the fused analysis bakes the sqrt-Hann window into kernel consts"
    del window
    sr, si, mag = rfft_hops_pallas(hs, m, nfft, with_mag=with_mag,
                                   interpret=interpret)
    return sr, si, mag, x[:, -hop:]


# ---------------------------------------------------------------------------
# synthesis
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _inv_consts(nfft: int):
    n2 = nfft // 128
    k1 = np.arange(128)
    wa = np.exp(2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(2j * np.pi * np.outer(np.arange(n2), k1) / nfft)
    wb = np.exp(2j * np.pi * np.outer(k1, np.arange(128)) / 128.0) / nfft
    return (wa, tw.real.astype(np.float32), tw.imag.astype(np.float32),
            wb.real.astype(np.float32), wb.imag.astype(np.float32), n2)


def _inv_kernel(yr_ref, yi_ref, twr_ref, twi_ref, wbr_ref, wbi_ref,
                win_ref, out_ref, prev_out_ref, prev_ref,
                *, n2: int, fb: int, cg: int, t_real: int):
    tstep = pl.program_id(1)

    @pl.when(tstep == 0)
    def _():
        prev_ref[:] = jnp.zeros(prev_ref.shape, jnp.float32)

    for f in range(fb):
        # stage A: Z[c, n2', k1] = sum_k2 Y[c, k2, k1] WA[k2, n2'] — all
        # channels of the group advance together, one (cg, 1, 128) MAC per
        # (n2', k2) term
        yr = yr_ref[:, f]                                   # (cg, n2, 128)
        yi = yi_ref[:, f]
        zr_rows = []
        zi_rows = []
        for a in range(n2):
            acc_r = jnp.zeros((cg, 1, 128), jnp.float32)
            acc_i = jnp.zeros((cg, 1, 128), jnp.float32)
            for c in range(n2):
                w = np.exp(2j * np.pi * (a * c) / n2)
                acc_r, acc_i = _acc_term(acc_r, acc_i, yr[:, c:c + 1],
                                         yi[:, c:c + 1],
                                         float(np.float32(w.real)),
                                         float(np.float32(w.imag)))
            zr_rows.append(acc_r)
            zi_rows.append(acc_i)
        zr = jnp.concatenate(zr_rows, axis=1)               # (cg, n2, 128)
        zi = jnp.concatenate(zi_rows, axis=1)
        gr = zr * twr_ref[:] - zi * twi_ref[:]
        gi = zr * twi_ref[:] + zi * twr_ref[:]
        # stage B: x[N2*n1' + n2'] = Re sum_k1 G[n2', k1] WB[k1, n1']
        xr = (_dot3(gr.reshape(cg * n2, 128), wbr_ref[:])
              - _dot3(gi.reshape(cg * n2, 128), wbi_ref[:])
              ).reshape(cg, n2, 128)
        p = xr * win_ref[:]                                 # (cg, n2, 128)
        # 50% overlap-add in stride layout: first half = lanes < 64
        out_ref[:, f] = p[:, :, :64] + prev_ref[:]
        prev_ref[:] = p[:, :, 64:]

        # the carry OUT is frame t_real-1's second half, written before the
        # zero-padded tail frames can clobber it
        @pl.when(tstep * fb + f == t_real - 1)
        def _():
            prev_out_ref[:] = prev_ref[:]


MAX_SYNTH_CHANNELS_PER_BLOCK = 8


def irfft_ola_batch_pallas(y_full_r, y_full_i, window, out_prev, nfft: int,
                           interpret: bool = False,
                           frames_per_step: int = FRAMES_PER_STEP):
    """Batched inverse DFT + synthesis window + 50% overlap-add.

    y_full_r/i: (C, T, N2, 128) Hermitian-expanded full spectra in the
    [k2 rows, k1 lanes] layout; out_prev (C, hop) per-channel OLA carries.
    Channels ride a second (major) grid dimension with the time axis minor,
    so each channel group's carry marches frames in order in VMEM scratch.
    Returns (out (C, T*hop), new_out_prev (C, hop)).
    """
    cc, t = y_full_r.shape[:2]
    fb = frames_per_step
    tp = -(-t // fb) * fb
    cg = min(MAX_SYNTH_CHANNELS_PER_BLOCK, cc)
    cp = -(-cc // cg) * cg
    _, twr, twi, wbr, wbi, n2 = _inv_consts(nfft)
    hop = nfft // 2
    pad = ((0, cp - cc), (0, tp - t), (0, 0), (0, 0))
    y_full_r = jnp.pad(y_full_r, pad)
    y_full_i = jnp.pad(y_full_i, pad)
    # stride-layout window and carry
    win_s = jnp.asarray(window, jnp.float32).reshape(128, n2).T  # (n2, 128)
    prev_s = jnp.transpose(
        jnp.asarray(out_prev, jnp.float32).reshape(cc, 64, n2), (0, 2, 1))

    kernel = functools.partial(_inv_kernel, n2=n2, fb=fb, cg=cg, t_real=t)
    const = lambda shape: pl.BlockSpec(shape, lambda c, i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((cg, fb, n2, 128), lambda c, i: (c, i, 0, 0),
                          memory_space=pltpu.VMEM)
    out, prev_out = pl.pallas_call(
        kernel,
        grid=(cp // cg, tp // fb),
        in_specs=[
            y_spec, y_spec,
            const((n2, 128)), const((n2, 128)),
            const((2, 128, 128)), const((2, 128, 128)),
            const((n2, 128)),
        ],
        out_specs=[
            pl.BlockSpec((cg, fb, n2, 64), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cg, n2, 64), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, tp, n2, 64), jnp.float32),
            jax.ShapeDtypeStruct((cp, n2, 64), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((cg, n2, 64), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(y_full_r, y_full_i, jnp.asarray(twr), jnp.asarray(twi),
      jnp.asarray(_bf16_pair(wbr)), jnp.asarray(_bf16_pair(wbi)),
      jnp.asarray(win_s))
    # the initial carry folds in outside: frame 0's first half adds
    # out_prev (the kernel starts each channel from a zero carry)
    out = out[:cc, :t]
    out = out.at[:, 0].add(prev_s)
    # de-stride: [n2 rows, n1 lanes] -> samples N2*n1 + n2
    stream = jnp.transpose(out, (0, 1, 3, 2)).reshape(cc, t * hop)
    new_prev = jnp.transpose(prev_out[:cc], (0, 2, 1)).reshape(cc, hop)
    return stream, new_prev


def irfft_ola_pallas(y_full_r, y_full_i, window, out_prev, nfft: int,
                     interpret: bool = False,
                     frames_per_step: int = FRAMES_PER_STEP):
    """Single-stream wrapper over :func:`irfft_ola_batch_pallas`."""
    out, prev = irfft_ola_batch_pallas(
        y_full_r[None], y_full_i[None], window, out_prev[None], nfft,
        interpret=interpret, frames_per_step=frames_per_step)
    return out[0], prev[0]


def istft_ext_fused(y_ext, engine, window, out_prev,
                    interpret: bool = False):
    """Streaming fused synthesis from extended-layout spectra.

    y_ext (T, NB) or (C, T, NB) complex with matching out_prev (hop,) or
    (C, hop). The Hermitian fold (models/common.py fold_ext) and mirror
    expansion run in XLA (cheap); the inverse DFT + window + overlap-add
    run fused, channel-batched when C is present.
    """
    from beamform_tpu.models.common import fold_ext
    nfft = engine.fft_win
    h = nfft // 2
    y_r = fold_ext(y_ext, nfft)                            # (..., h+1)
    full = jnp.concatenate(
        [y_r, jnp.conj(y_r[..., h - 1:0:-1])], axis=-1)    # (..., nfft)
    yf = full.reshape(full.shape[:-1] + (nfft // 128, 128))
    if y_ext.ndim == 2:
        return irfft_ola_pallas(yf.real, yf.imag, window, out_prev, nfft,
                                interpret=interpret)
    return irfft_ola_batch_pallas(yf.real, yf.imag, window, out_prev, nfft,
                                  interpret=interpret)
