"""Fused phase-mask kernels: the Phase and PhaseMPF per-bin pipelines.

The XLA formulations (models/phase.py, models/phasempf.py) are dominated by
the pairwise phase-distance tensor: aligned phases (T, M, NB) go through
M(M-1)/2 pair gathers and a (T, pairs, NB) wrapped-|diff| reduction, with
atan2 over every (frame, mic, bin) — measured 13.9 ms of phasempf's 17.9 ms
forward at the 16-ch launch shape. These kernels run the whole per-bin
pipeline between the existing fused WOLA kernels (wola_pallas.stft_planes
in, istft_ext_fused out) with everything VMEM-resident:

- **alignment + phases**: conj(w) * X per mic (phase.cpp:102-104) and a
  hand-rolled f32 atan2 (Mosaic has no atan/atan2 lowering) — Cephes-style
  odd polynomial after two range reductions, ~2 ulp;
- **pairwise mean**: the static upper-triangle pair loop runs in-register
  over (fb, 1, NBP) rows (phase.cpp:53-68 semantics);
- **masks**: phase's gated keep/attenuate (phase.cpp:100-123) or
  phasempf's dual SOI/interference beams (phasempf.cpp:210-248). The
  output phase is reconstructed WITHOUT trigonometry: cos/sin of the
  reference mic's atan2 phase are algebraically x0 / |x0|;
- **MCRA/MPF march** (phasempf only): the per-frame recurrences
  (phasempf.cpp:140-191, 255-295) march sequentially with the 9-field
  state held as (1, NBP) VMEM rows; current_L / first_L evolve as
  lane-broadcast rows so no scalar state exists.

Numerics: identical algebra to the XLA path except atan2 rounding (~2 ulp)
and the trig-free phase reconstruction — both flip the binary masks only
when a bin's mean pair distance sits within ~1e-6 rad of the threshold, so
output parity is pinned as "99.9th percentile tight, rare isolated
flip-bins bounded" (tests/test_phase_mask.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES_PER_STEP = 8

# Cephes atanf coefficients (odd polynomial in z over |z| <= tan(pi/8))
_P0 = 8.05374449538e-2
_P1 = -1.38776856032e-1
_P2 = 1.99777106478e-1
_P3 = -3.33329491539e-1
_TAN_PI_8 = 0.4142135623730951


def atan2f(y, x):
    """Branchless f32 atan2 for Mosaic (~2 ulp): range-reduce to
    t = min/max in [0, 1], fold [tan(pi/8), 1] onto (t-1)/(t+1), Cephes
    odd polynomial, then undo the octant/quadrant folds. ONE division:
    the fold test lo > tan(pi/8)*hi and the fold argument
    (lo-hi)/(lo+hi) both avoid materializing t = lo/hi."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    use2 = lo > np.float32(_TAN_PI_8) * hi
    num = jnp.where(use2, lo - hi, lo)
    den = jnp.where(use2, lo + hi, hi)
    z = num / jnp.maximum(den, 1e-38)
    s = z * z
    p = (((_P0 * s + _P1) * s + _P2) * s + _P3) * s * z + z
    a = jnp.where(use2, np.float32(np.pi / 4) + p, p)
    a = jnp.where(ay > ax, np.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0.0, np.float32(np.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _pair_mean_dist(phase, ia, ib, m: int):
    """(fb, M, NBP) aligned phases -> (fb, 1, NBP) mean wrapped pair
    distance (d > pi -> 2 pi - d), phase.cpp:57-61. The upper triangle is
    walked per anchor mic — one (fb, M-1-i, NBP) wide op per anchor
    instead of M(M-1)/2 single-row ops (issue overhead dominates rows of
    this size)."""
    acc = jnp.zeros(phase[:, 0:1, :].shape, jnp.float32)
    for i in range(m - 1):
        d = jnp.abs(phase[:, i:i + 1, :] - phase[:, i + 1:, :])
        w = jnp.where(d > np.float32(np.pi), np.float32(2.0 * np.pi) - d, d)
        acc = acc + jnp.sum(w, axis=1, keepdims=True)
    return acc * np.float32(1.0 / (m * (m - 1) // 2))


def _aligned_and_stats(sr, si, wr, wi, m: int, ia, ib):
    """Shared front end: returns (diff_mean, mag_mean, x0 unit vector
    parts, x0r, x0i) — all (fb, 1, NBP)."""
    ar = wr * sr + wi * si                                 # conj(w) * x
    ai = wr * si - wi * sr
    phase = atan2f(ai, ar)
    diff_mean = _pair_mean_dist(phase, ia, ib, m)
    mag_mean = jnp.sum(jnp.sqrt(sr * sr + si * si), axis=1,
                       keepdims=True) * np.float32(1.0 / m)
    x0r = sr[:, 0:1, :]
    x0i = si[:, 0:1, :]
    # cos/sin of atan2(x0i, x0r) without trig: x0 / |x0| (0 phase at 0)
    a0 = jnp.sqrt(x0r * x0r + x0i * x0i)
    inv0 = jnp.where(a0 > 0.0, 1.0 / jnp.maximum(a0, 1e-38), 0.0)
    ur = jnp.where(a0 > 0.0, x0r * inv0, 1.0)
    ui = x0i * inv0
    return diff_mean, mag_mean, ur, ui, x0r, x0i


# ---------------------------------------------------------------------------
# Phase (stateless mask, phase.cpp:70-134)


def _phase_kernel(sr_ref, si_ref, wr_ref, wi_ref, yr_ref, yi_ref, *,
                  m: int, ia, ib, per_frame_w: bool, min_phase_rad: float,
                  mag_threshold: float, mag_mult: float, nfft: int,
                  fb: int):
    sr = sr_ref[...]
    si = si_ref[...]
    wr = wr_ref[...] if per_frame_w else wr_ref[0][None]
    wi = wi_ref[...] if per_frame_w else wi_ref[0][None]
    diff_mean, mag_mean, ur, ui, x0r, x0i = _aligned_and_stats(
        sr, si, wr, wi, m, ia, ib)
    keep = ((mag_mean * np.float32(1.0 / nfft) > mag_threshold)
            & (diff_mean < min_phase_rad))
    mag = jnp.where(keep, mag_mean, mag_mean * np.float32(mag_mult))
    yr = mag * ur
    yi = mag * ui
    lane = jax.lax.broadcasted_iota(jnp.int32, yr.shape, 2)
    yr_ref[...] = jnp.where(lane == 0, x0r, yr)[:, 0, :]
    yi_ref[...] = jnp.where(lane == 0, x0i, yi)[:, 0, :]


def phase_mask_pallas(sr, si, wr_u, wi_u, w_idx, *, min_phase_rad: float,
                      mag_threshold: float, mag_mult: float, nfft: int,
                      ia, ib, interpret: bool = False,
                      frames_per_step: int = FRAMES_PER_STEP):
    """sr/si (T, M, NBP) analysis planes; wr_u/wi_u (U, M, NBP) steering
    planes; w_idx (T,) steering row per frame. Returns y planes
    (T, NBP) x2 — lanes past the extended layout carry garbage."""
    t, m, nibp = sr.shape
    fb = frames_per_step
    tp = -(-t // fb) * fb
    per_frame_w = wr_u.shape[0] > 1
    sr = jnp.pad(sr, ((0, tp - t), (0, 0), (0, 0)))
    si = jnp.pad(si, ((0, tp - t), (0, 0), (0, 0)))
    if per_frame_w:
        wr_u, wi_u = wr_u[w_idx], wi_u[w_idx]
        wr_u = jnp.pad(wr_u, ((0, tp - t), (0, 0), (0, 0)))
        wi_u = jnp.pad(wi_u, ((0, tp - t), (0, 0), (0, 0)))
        w_spec = pl.BlockSpec((fb, m, nibp), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((1, m, nibp), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _phase_kernel, m=m, ia=tuple(ia), ib=tuple(ib),
        per_frame_w=per_frame_w, min_phase_rad=float(min_phase_rad),
        mag_threshold=float(mag_threshold), mag_mult=float(mag_mult),
        nfft=nfft, fb=fb)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(tp // fb,),
        in_specs=[
            pl.BlockSpec((fb, m, nibp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, m, nibp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec, w_spec,
        ],
        out_specs=[
            pl.BlockSpec((fb, nibp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, nibp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((tp, nibp), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(sr, si, wr_u, wi_u)
    return yr[:t], yi[:t]


# ---------------------------------------------------------------------------
# PhaseMPF (dual beams + MCRA/MPF march, phasempf.cpp:140-302)

#: state row order in the (9, NBP) planes
MPF_ROWS = ("s_prev", "s_tmp", "s_min", "lam_noise", "z", "lam_rev0",
            "lam_rev1", "current_l", "first_l")


def _mpf_kernel(sr_ref, si_ref, wr_ref, wi_ref, st_in,
                yr_ref, yi_ref, st_out, st, *,
                m: int, ia, ib, per_frame_w: bool, t_real: int, fb: int,
                p, bug_dc_zero: bool):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    nibp = st.shape[-1]
    f32 = jnp.float32

    @pl.when(step == 0)
    def _():
        st[:] = st_in[:]

    sr = sr_ref[...]
    si = si_ref[...]
    wr = wr_ref[...] if per_frame_w else wr_ref[0][None]
    wi = wi_ref[...] if per_frame_w else wi_ref[0][None]
    diff_mean, mag_mean, ur, ui, x0r, x0i = _aligned_and_stats(
        sr, si, wr, wi, m, ia, ib)

    # dual beams (phasempf.cpp:210-248): SOI keeps the mean magnitude where
    # the pair distance is small, the interference beam is complementary;
    # both sit at the reference mic's phase; DC carries X0[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, diff_mean.shape, 2)
    is_soi = diff_mean < np.float32(p.min_phase * np.pi / 180.0)
    mm = np.float32(p.min_mag)
    soi_mag = jnp.where(is_soi, mag_mean, mag_mean * mm)
    int_mag = jnp.where(is_soi, mag_mean * mm, mag_mean)
    dc_amp = jnp.sqrt(x0r * x0r + x0i * x0i)
    soi_sq = jnp.where(lane == 0, 0.0, soi_mag * soi_mag)
    int_sq = jnp.where(lane == 0, 0.0, int_mag * int_mag)
    # buggy freq smoothing (phasempf.cpp:150, PARITY.md): bin j scaled by
    # the sum of in-range kernel coefficients; extended layout -> bin 1 at
    # 0.75, everything else 1.0; DC slot carries |X0[0]|
    s_f = jnp.where(lane == 1, soi_sq * 0.75, soi_sq)
    s_f = jnp.where(lane == 0, dc_amp, s_f)

    a_s = np.float32(p.MCRA_alphaS)
    a_d = np.float32(p.MCRA_alphaD)
    a_d2 = np.float32(p.MCRA_alphaD2)
    delta = np.float32(p.MCRA_delta)
    big_l = np.float32(p.MCRA_L)
    mpf_as = np.float32(p.MPF_alphaS)
    eta = np.float32(p.MPF_eta)
    gam = np.float32(p.MPF_rev_gamma)
    rev_c = np.float32(1.0 - p.MPF_rev_gamma / p.MPF_rev_delta)  # quirk
    amp = np.float32(p.out_amp)
    floor = np.float32(p.noise_floor)

    for f in range(fb):
        t = step * fb + f

        @pl.when(t < t_real)
        def _frame():
            s_f_t = s_f[f, :, :]                           # (1, nibp)
            soi_sq_t = soi_sq[f, :, :]
            int_sq_t = int_sq[f, :, :]

            s = a_s * st[0:1] + (1.0 - a_s) * s_f_t
            rollover = st[7:8] > big_l
            s_min = jnp.where(rollover, jnp.minimum(st[1:2], s),
                              jnp.minimum(st[2:3], s))
            s_tmp = jnp.where(rollover, s, jnp.minimum(st[1:2], s))
            current_l = jnp.where(rollover, 1.0, st[7:8] + 1.0)
            first_l = jnp.where(rollover, 0.0, st[8:9])
            lam_n = st[3:4]
            cond = ((first_l > 0.0) | (s < s_min * delta)
                    | (lam_n > soi_sq_t))
            inv_l = 1.0 / current_l
            use_first = (first_l > 0.0) & (inv_l > a_d)
            lam_first = inv_l * lam_n + (1.0 - inv_l) * soi_sq_t
            lam_norm = a_d2 * lam_n + (1.0 - a_d) * soi_sq_t
            lam_noise = jnp.where(
                cond, jnp.where(use_first, lam_first, lam_norm), lam_n)

            z = mpf_as * st[4:5] + (1.0 - mpf_as) * int_sq_t
            leak = eta * z
            rev0 = gam * st[5:6] + rev_c * soi_sq_t
            rev1 = gam * st[6:7] + rev_c * int_sq_t
            lam = jnp.sqrt(lam_noise + leak + rev0 + rev1)

            st[0:1] = s
            st[1:2] = s_tmp
            st[2:3] = s_min
            st[3:4] = lam_noise
            st[4:5] = z
            st[5:6] = rev0
            st[6:7] = rev1
            st[7:8] = current_l
            st[8:9] = first_l

            mag_soi = soi_mag[f, :, :]                     # (1, nibp)
            if p.out_only_noise:
                mag = lam * amp
            else:
                if p.out_only_mcra:
                    mag = (mag_soi - jnp.sqrt(lam_noise)) * amp
                else:
                    mag = (mag_soi - lam) * amp
                mag = jnp.where(mag < 0.0, floor, mag)
            lane1 = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
            yr = mag * ur[f, :, :]
            yi = mag * ui[f, :, :]
            if bug_dc_zero:
                yr = jnp.where(lane1 == 0, 0.0, yr)
                yi = jnp.where(lane1 == 0, 0.0, yi)
            else:
                yr = jnp.where(lane1 == 0, x0r[f, :, :], yr)
                yi = jnp.where(lane1 == 0, x0i[f, :, :], yi)
            yr_ref[f, :] = yr[0]
            yi_ref[f, :] = yi[0]

    @pl.when(step == nsteps - 1)
    def _():
        st_out[:] = st[:]


def phasempf_march_pallas(sr, si, wr_u, wi_u, w_idx, state_rows, params,
                          bug_dc_zero: bool, interpret: bool = False,
                          frames_per_step: int = FRAMES_PER_STEP):
    """sr/si (T, M, NBP) analysis planes; wr_u/wi_u (U, M, NBP) steering;
    state_rows (9, NBP) f32 (MPF_ROWS order). Returns (y planes (T, NBP)
    x2, new state rows)."""
    t, m, nibp = sr.shape
    fb = frames_per_step
    tp = -(-t // fb) * fb
    per_frame_w = wr_u.shape[0] > 1
    sr = jnp.pad(sr, ((0, tp - t), (0, 0), (0, 0)))
    si = jnp.pad(si, ((0, tp - t), (0, 0), (0, 0)))
    if per_frame_w:
        wr_u, wi_u = wr_u[w_idx], wi_u[w_idx]
        wr_u = jnp.pad(wr_u, ((0, tp - t), (0, 0), (0, 0)))
        wi_u = jnp.pad(wi_u, ((0, tp - t), (0, 0), (0, 0)))
        w_spec = pl.BlockSpec((fb, m, nibp), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((1, m, nibp), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    from beamform_tpu.models.phase import pair_indices
    ia, ib = pair_indices(m)
    kernel = functools.partial(
        _mpf_kernel, m=m, ia=tuple(ia), ib=tuple(ib),
        per_frame_w=per_frame_w, t_real=t, fb=fb, p=params,
        bug_dc_zero=bool(bug_dc_zero))
    yr, yi, st = pl.pallas_call(
        kernel,
        grid=(tp // fb,),
        in_specs=[
            pl.BlockSpec((fb, m, nibp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, m, nibp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec, w_spec,
            pl.BlockSpec((9, nibp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((fb, nibp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, nibp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, nibp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, nibp), jnp.float32),
            jax.ShapeDtypeStruct((tp, nibp), jnp.float32),
            jax.ShapeDtypeStruct((9, nibp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((9, nibp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(sr, si, wr_u, wi_u, state_rows)
    return yr[:t], yi[:t], st
