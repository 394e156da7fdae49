"""Mega-fused streaming GSS: analysis -> demixing update -> synthesis in
ONE Pallas kernel.

The GSS model path (models/gss.py) runs the per-frame natural-gradient
demixing update as an XLA ``lax.scan`` over frames with full spectra planes
round-tripping HBM between the WOLA kernels and the scan — the same
three-stage shape the MVDR/LCMV mega kernel (kernels/mega_stream.py)
eliminated. This kernel applies the identical frame-march fusion to GSS:

- **analysis / synthesis**: reused verbatim from mega_stream
  (``_analyze_block`` / ``_synthesize_block`` — frame-batched fused WOLA,
  leading ``k2cov`` 128-bin groups only, spectra never leave VMEM).
- **demixing state**: W (S, M, NIBP) f32 re/im planes live in VMEM scratch
  for the whole launch; the carried model state (Nib, S, M) complex
  converts at the chunk boundary only.
- **per-frame march** (gss.cpp:96-156): reset W <- A^H on control-change
  frames (update_weights, gss.cpp:90-93); y = W x with the PRE-update W
  (gss.cpp:120-121); natural-gradient step (gss.cpp:124-136)

      E y     = y * (sum_k |y_k|^2 - |y|^2)        (E = y y^H, zero diag)
      dJ1     = 4 S_act (E y) x^H / ||x||^4
      dJ2     = (2/S_act) ((W A) - diag(act)) A^H
      W      <- (1 - lambda mu) W - mu (dJ1 + dJ2)

  masked per bin by the energy gate (mag > threshold, gss.cpp:112-117);
  gate-failing bins emit 0.01 * X0 and skip the update.

Masked fixed-capacity interference slots ride through unchanged: inactive
slots have zero A^H rows, so their W rows stay identically zero under the
update (dJ1 row = 0 because y_s = 0; dJ2 row = 0 because (WA - D) row = 0),
and the active count S_act / the diag(act) correction are derived IN-KERNEL
from the control planes (a slot is active iff its steering row is nonzero)
— no extra per-frame scalar inputs.

Capacity: same half-spectrum synthesis constraints as mega_stream (band
must not reach the Nyquist bin) plus bin 0 must be out of band (gss has no
DC special case — gss.cpp:110 — and a complex in-band y[0] would break the
Hermitian fold); see ``gss_fits``.
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

from beamform_tpu.kernels.wola_pallas import _bf16_pair, _fwd_consts
from beamform_tpu.kernels.mvdr_stream import _cmul, _cmul_conj
from beamform_tpu.kernels.mega_stream import (
    FRAMES_PER_STEP,
    SEG_FRAMES,
    _analyze_block,
    _synth_consts,
    _synthesize_block,
)


def _kernel(hops_ref, init_hop_ref, w_in_r, w_in_i, ctrl_r_ref, ctrl_i_ref,
            reset_ref, mask_ref,
            w1r_ref, w1i_ref, twr_ref, twi_ref, wlo_ref, whi_ref,
            war_ref, wai_ref, stwr_ref, stwi_ref, wbr_ref, wbi_ref,
            wins_ref,
            out_ref, w_out_r, w_out_i, ola_out_ref,
            wr, wi, prev_hop, ola, ysr, ysi, *,
            m: int, n2: int, k2cov: int, nfft: int, fb: int, t_real: int,
            s_cap: int, per_frame_ctrl: bool, mag_threshold: float,
            mu: float, lam: float):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    nibp = k2cov * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nibp), 2)
    del lane  # bin 0 is out of band by the gss_fits contract
    srow = jax.lax.broadcasted_iota(jnp.int32, (s_cap, 1, nibp), 0)
    f32 = jnp.float32
    muf = np.float32(mu)
    one_lm = np.float32(1.0 - lam * mu)

    @pl.when(step == 0)
    def _prologue():
        wr[:] = w_in_r[:]
        wi[:] = w_in_i[:]
        prev_hop[:] = init_hop_ref[0].reshape(n2 * m, 64)
        ola[:] = jnp.zeros(ola.shape, f32)

    # ---- frame-BATCHED analysis (mega_stream._analyze_block) -------------
    cur_all = hops_ref[...].reshape(fb * n2 * m, 64)
    prev_all = jnp.concatenate(
        [prev_hop[:], cur_all[:(fb - 1) * n2 * m]], axis=0)
    spec_r, spec_i, mag = _analyze_block(
        prev_all, cur_all, w1r_ref[:], w1i_ref[:], twr_ref[:], twi_ref[:],
        wlo_ref[:], whi_ref[:], m, n2, k2cov, nfft, fb)
    prev_hop[:] = cur_all[(fb - 1) * n2 * m:]
    gate_all = ((mag > mag_threshold)
                & (mask_ref[:] != 0.0))                    # (fb, 1, nibp)

    def ctrl_at(f: int):
        fi = f if per_frame_ctrl else 0
        return ctrl_r_ref[fi], ctrl_i_ref[fi]              # (s_cap, m, nibp)

    def act_of(ar, ai):
        """Active-slot indicators from the steering planes: slot k is
        active iff its (masked) A^H row is nonzero anywhere."""
        acts = [(jnp.sum(ar[k] * ar[k] + ai[k] * ai[k]) > 0.0).astype(f32)
                for k in range(s_cap)]
        return acts, functools.reduce(lambda a, b: a + b, acts)

    if not per_frame_ctrl:
        const_acts, const_sact = act_of(*ctrl_at(0))

    # ---- per-frame march: reset, y = W x, natural-gradient update --------
    for f in range(fb):
        t = step * fb + f

        @pl.when(t < t_real)
        def _frame():
            ar, ai = ctrl_at(f)
            if per_frame_ctrl:
                acts, s_act = act_of(ar, ai)
            else:
                acts, s_act = const_acts, const_sact

            rst = jnp.sum(reset_ref[f:f + 1, :]) > 0.0
            @pl.when(rst)
            def _reset():                                  # gss.cpp:90-93
                wr[:] = ar
                wi[:] = ai

            xc_r = spec_r[f:f + 1]                         # (1, m, nibp)
            xc_i = spec_i[f:f + 1]
            gate = gate_all[f:f + 1]                       # (1, 1, nibp)

            # y = W x with the pre-update W (gss.cpp:120-121)
            pr, pi = _cmul(wr[:], wi[:], xc_r, xc_i)       # (s, m, nibp)
            yr = jnp.sum(pr, axis=1, keepdims=True)        # (s, 1, nibp)
            yi = jnp.sum(pi, axis=1, keepdims=True)
            ysr[f:f + 1] = yr[0:1]
            ysi[f:f + 1] = yi[0:1]

            # E y = y (tot - |y|^2): E = y y^H with zeroed diagonal
            y2 = yr * yr + yi * yi                         # (s, 1, nibp)
            tot = jnp.sum(y2, axis=0, keepdims=True)       # (1, 1, nibp)
            eyr = yr * (tot - y2)
            eyi = yi * (tot - y2)

            # dJ1 = 4 S_act (E y) x^H / alpha, alpha = ||x||^4
            xm2 = jnp.sum(xc_r * xc_r + xc_i * xc_i, axis=1,
                          keepdims=True)                   # (1, 1, nibp)
            alpha = xm2 * xm2
            d1r, d1i = _cmul_conj(eyr, eyi, xc_r, xc_i)    # (s, m, nibp)
            c1 = (4.0 * s_act) / jnp.maximum(alpha, 1e-30)

            # dJ2 = (2/S_act) ((W A) - diag(act)) A^H, A = (A^H)^H
            d2r = jnp.zeros((s_cap, m, nibp), f32)
            d2i = jnp.zeros((s_cap, m, nibp), f32)
            for k in range(s_cap):
                ahk_r = ar[k:k + 1]                        # (1, m, nibp)
                ahk_i = ai[k:k + 1]
                tr, ti = _cmul_conj(wr[:], wi[:], ahk_r, ahk_i)
                wak_r = jnp.sum(tr, axis=1, keepdims=True)  # (s, 1, nibp)
                wak_i = jnp.sum(ti, axis=1, keepdims=True)
                wak_r = wak_r - jnp.where(srow == k, acts[k], 0.0)
                ur_, ui_ = _cmul(wak_r, wak_i, ahk_r, ahk_i)
                d2r = d2r + ur_
                d2i = d2i + ui_
            c2 = 2.0 / jnp.maximum(s_act, 1.0)

            wn_r = one_lm * wr[:] - muf * (c1 * d1r + c2 * d2r)
            wn_i = one_lm * wi[:] - muf * (c1 * d1i + c2 * d2i)
            wr[:] = jnp.where(gate, wn_r, wr[:])
            wi[:] = jnp.where(gate, wn_i, wi[:])

    # ---- batched per-bin combine (gss.cpp:112-121, no DC special case) ---
    x0_r = spec_r[:, 0:1, :]                               # (fb, 1, nibp)
    x0_i = spec_i[:, 0:1, :]
    in_band = mask_ref[:] != 0.0
    y_r = jnp.where(gate_all, ysr[:], jnp.where(in_band, 0.01 * x0_r, 0.0))
    y_i = jnp.where(gate_all, ysi[:], jnp.where(in_band, 0.01 * x0_i, 0.0))

    # ---- frame-BATCHED synthesis + in-block overlap-add ------------------
    p = _synthesize_block(y_r, y_i, war_ref[:], wai_ref[:],
                          stwr_ref[:], stwi_ref[:], wbr_ref[:], wbi_ref[:],
                          wins_ref[:], n2, k2cov, fb)
    first = p[:, :, :64]
    second = p[:, :, 64:]
    prev_block = jnp.concatenate([ola[:][None], second[:fb - 1]], axis=0)
    out_ref[...] = first + prev_block
    nvalid = jnp.clip(t_real - step * fb, 1, fb)
    frow = jax.lax.broadcasted_iota(jnp.int32, (fb, n2, 64), 0)
    sel = (frow == nvalid - 1).astype(f32)
    ola[:] = jnp.sum(second * sel, axis=0)

    @pl.when(step == nsteps - 1)
    def _epilogue():
        w_out_r[:] = wr[:]
        w_out_i[:] = wi[:]
        ola_out_ref[:] = ola[:]


def _gss_call(hs, w0_r, w0_i, ctrl_r, ctrl_i, reset, band_mask, nfft: int,
              mag_threshold: float, mu: float, lam: float, interpret: bool,
              frames_per_step: int):
    """One pallas launch over T = hs.shape[0]-1 frames. hs (T+1, n2, m, 64)
    stride hops (hs[0] is the carried tail hop); w0 (S, M, NIBP) planes;
    ctrl (U|T, S, M, NIBP) A^H planes (U==1 constant control, else
    pre-gathered per frame); reset (T, 128) f32 per-frame reset flags;
    band_mask (1, 1, NIBP). Returns (audio (tp, n2, 64), W planes x2,
    OLA carry (n2, 64))."""
    t = hs.shape[0] - 1
    n2 = nfft // 128
    m = hs.shape[2]
    nibp = band_mask.shape[-1]
    k2cov = nibp // 128
    fb = int(os.environ.get("BEAMFORM_MEGA_FB", frames_per_step))
    tp = -(-t // fb) * fb
    s_cap = ctrl_r.shape[1]
    per_frame_ctrl = ctrl_r.shape[0] > 1

    w1r, w1i, twr, twi, win_lo, win_hi, _ = _fwd_consts(nfft, m)
    war, wai, stwr, stwi, wbr, wbi = _synth_consts(nfft, k2cov)
    w1r, w1i = _bf16_pair(w1r), _bf16_pair(w1i)
    wbr, wbi = _bf16_pair(wbr), _bf16_pair(wbi)
    from beamform_tpu.dsp.wola import sqrt_hann
    win_s = sqrt_hann(nfft, np.float32).reshape(128, n2).T  # (n2, 128)

    hops = jnp.pad(hs[1:], ((0, tp - t), (0, 0), (0, 0), (0, 0)))
    reset_p = jnp.pad(reset, ((0, tp - t), (0, 0)))
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
        _kernel, m=m, n2=n2, k2cov=k2cov, nfft=nfft, fb=fb, t_real=t,
        s_cap=s_cap, per_frame_ctrl=per_frame_ctrl,
        mag_threshold=float(mag_threshold), mu=float(mu), lam=float(lam))

    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(tp // fb,),
        in_specs=[
            pl.BlockSpec((fb, n2, m, 64), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, n2, m, 64)),
            const((s_cap, m, nibp)), const((s_cap, m, nibp)),
            ctrl_spec, ctrl_spec,
            pl.BlockSpec((fb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
            const((s_cap, m, nibp)), const((s_cap, m, nibp)),
            const((n2, 64)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, n2, 64), f32),
            jax.ShapeDtypeStruct((s_cap, m, nibp), f32),
            jax.ShapeDtypeStruct((s_cap, m, nibp), f32),
            jax.ShapeDtypeStruct((n2, 64), f32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((s_cap, m, nibp), f32)] * 2
            + [pltpu.VMEM((n2 * m, 64), f32)]
            + [pltpu.VMEM((n2, 64), f32)]
            + [pltpu.VMEM((fb, 1, nibp), f32)] * 2
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "BEAMFORM_MEGA_VMEM", 32 * 1024 * 1024))),
        interpret=interpret,
    )(hops, hs[0:1], w0_r, w0_i, ctrl_r, ctrl_i, reset_p, band_mask,
      jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(win_lo), jnp.asarray(win_hi),
      jnp.asarray(war), jnp.asarray(wai), jnp.asarray(stwr),
      jnp.asarray(stwi), jnp.asarray(wbr), jnp.asarray(wbi),
      jnp.asarray(win_s))
    audio, w_r, w_i, ola = outs
    return audio[:t], w_r, w_i, ola


def _gss_segments(hs, w0_r, w0_i, ctrl_r, ctrl_i, reset, band_mask,
                  nfft: int, mag_threshold: float, mu: float, lam: float,
                  interpret: bool, frames_per_step: int):
    """Chain <=SEG_FRAMES-frame launches (see mega_stream._mega_segments):
    W planes and the OLA half-frame carry between launches; each segment's
    leading hop is the previous segment's last hop."""
    t = hs.shape[0] - 1
    seg = int(os.environ.get("BEAMFORM_MEGA_SEG", SEG_FRAMES))
    per_frame = ctrl_r.shape[0] > 1
    audios = []
    wr, wi = w0_r, w0_i
    ola = None
    for s0 in range(0, t, seg):
        s1 = min(t, s0 + seg)
        cr = ctrl_r[s0:s1] if per_frame else ctrl_r
        ci = ctrl_i[s0:s1] if per_frame else ctrl_i
        audio, wr, wi, ola_n = _gss_call(
            hs[s0:s1 + 1], wr, wi, cr, ci, reset[s0:s1], band_mask, nfft,
            mag_threshold, mu, lam, interpret, frames_per_step)
        if ola is not None:
            audio = audio.at[0].add(ola)
        audios.append(audio)
        ola = ola_n
    return (audios[0] if len(audios) == 1 else
            jnp.concatenate(audios, axis=0)), wr, wi, ola


def gss_fits(m: int, ib, nfft: int, s_cap: int,
             budget: int = 18 * 1024 * 1024) -> bool:
    """Whether the fused GSS kernel can take this configuration on-core.

    Same synthesis constraints as mega_stream.mega_fits (no Nyquist /
    shadow bin in band) plus bin 0 out of band (gss has no DC special case
    and the half-spectrum fold needs y[0] real), plus the VMEM scratch set
    (W planes x3 pairs, per-frame control blocks at the worst case,
    analysis hop scratch) within budget."""
    from beamform_tpu.kernels.wola_pallas import MAX_CHANNELS_PER_BLOCK
    if m > MAX_CHANNELS_PER_BLOCK:
        return False
    if len(ib) == 0 or int(np.min(ib)) < 1:
        return False
    if int(np.max(ib)) >= nfft // 2:
        return False
    nibp = (int(np.max(ib)) + 128) // 128 * 128
    n2 = nfft // 128
    fb = FRAMES_PER_STEP
    scratch = (6 * s_cap * m                     # W in/out/scratch planes
               + 4 * fb * s_cap * m              # per-frame ctrl, dbl-buf
               + 2 * fb                          # ys planes
               ) * nibp * 4
    scratch += (fb * n2 * m * 64 * 2 + n2 * m * 64 + n2 * 64) * 4
    return scratch <= budget


def gss_mega(x, tail, out_prev, w0, ah_ib, idx, reset, ib, nfft: int,
             mag_threshold: float, mu: float, lam: float,
             interpret: bool = False,
             frames_per_step: int = FRAMES_PER_STEP):
    """Fused GSS step.

    x (M, S) audio; tail (M, hop) analysis carry; out_prev (hop,) OLA
    carry; w0 (Nib, S, M) complex demixing state over the in-band bins
    ``ib``; ah_ib (U, S, M, Nib) complex A^H planes per unique control row;
    idx (T,) control index per frame; reset (T,) bool W-reset flags.
    Returns (audio (S,), w (Nib, S, M), out_prev' (hop,)).
    """
    if x.shape[1] < nfft // 2:
        return (jnp.zeros((0,), jnp.float32), jnp.asarray(w0),
                jnp.asarray(out_prev, jnp.float32))
    m, _ = x.shape
    n2 = nfft // 128
    hop = nfft // 2
    t = x.shape[1] // hop
    ibj = jnp.asarray(np.asarray(ib))
    nibp = (int(np.max(np.asarray(ib))) + 128) // 128 * 128
    s_cap = w0.shape[1]

    ext = jnp.concatenate([jnp.asarray(tail, x.dtype), x], axis=-1)
    hs = jnp.transpose(ext.reshape(m, t + 1, 64, n2), (1, 3, 0, 2))
    mask = np.zeros((1, 1, nibp), np.float32)
    mask[0, 0, np.asarray(ib)] = 1.0

    w_p = jnp.zeros((s_cap, m, nibp), jnp.float32)
    w0_sm = jnp.moveaxis(w0, 0, -1)                        # (S, M, Nib)
    w0_r = w_p.at[..., ibj].set(w0_sm.real.astype(jnp.float32))
    w0_i = w_p.at[..., ibj].set(w0_sm.imag.astype(jnp.float32))

    u = ah_ib.shape[0]
    c_p = jnp.zeros((u, s_cap, m, nibp), jnp.float32)
    c_r = c_p.at[..., ibj].set(ah_ib.real.astype(jnp.float32))
    c_i = c_p.at[..., ibj].set(ah_ib.imag.astype(jnp.float32))
    if u > 1:
        c_r, c_i = c_r[idx], c_i[idx]

    reset_rows = jnp.broadcast_to(
        jnp.asarray(reset, jnp.float32)[:, None], (t, 128))

    audio, w_r, w_i, ola = _gss_segments(
        hs, w0_r, w0_i, c_r, c_i, reset_rows, jnp.asarray(mask), nfft,
        mag_threshold, mu, lam, interpret, frames_per_step)

    prev_s = jnp.transpose(jnp.asarray(out_prev, jnp.float32)
                           .reshape(64, n2))
    audio = audio.at[0].add(prev_s)
    stream = jnp.transpose(audio, (0, 2, 1)).reshape(t * hop)
    w_new = jnp.moveaxis(jax.lax.complex(w_r, w_i)[..., ibj], -1, 0)
    new_prev = jnp.transpose(ola).reshape(hop)
    return stream, w_new, new_prev
