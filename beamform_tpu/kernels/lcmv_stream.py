"""Fused streaming LCMV solve kernel.

The LCMV sibling of kernels/mvdr_stream.py — identical sliding-covariance
march (rank-1 VMEM updates, epoch-exact resets, per-frame gate skip) with
the constraint-space solve of lcmv.cpp:108-138 per active frame:

    X   = R^-1 C          (multi-RHS Cholesky solves, one per slot)
    G   = C^H X           (S x S per bin, S = 1 + interference capacity)
    w   = X G^-1 e0
    y   = w^H x

Inactive constraint slots have all-zero C columns (the fixed-capacity
masked-timeline design); the kernel detects them per bin from the column
norm and adds the masked identity on those diagonal entries of G, exactly
like the dense path's ``lcmv_solve`` — which the tests prove equals the
smaller active-set problem.

The S x S inner system lives as python-unrolled (1, 1, NIB) lane vectors:
a Gauss-Jordan inverse (+ one refinement step, mirroring the dense path's
Newton-polished ``batched_inv``) costs ~S^3 tiny VPU ops — S is 1 + the
active interference capacity, i.e. small for every launch-file
configuration, and cost scales the same way the reference's per-bin Eigen
solves do.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamform_tpu.kernels.mvdr_stream import (
    FRAMES_PER_STEP,
    _cmul,
    _cmul_conj,
    cholesky_factor,
    make_solvers,
    sliding_update,
)


def _small_gj_inverse(mr, mi, s):
    """Inverse of an S x S complex matrix of (1,1,NIB) lane vectors via
    unpivoted Gauss-Jordan (the inner matrices are HPD on active slots and
    masked-identity on inactive ones). Returns (invR, invI) nested lists."""
    mr = [row[:] for row in mr]
    mi = [row[:] for row in mi]
    ir = [[None] * s for _ in range(s)]
    ii = [[None] * s for _ in range(s)]
    zero = mr[0][0] * 0.0
    for a in range(s):
        for b in range(s):
            ir[a][b] = zero + (1.0 if a == b else 0.0)
            ii[a][b] = zero
    for k in range(s):
        den = mr[k][k] * mr[k][k] + mi[k][k] * mi[k][k]
        inv_den = 1.0 / den
        pr, pi = mr[k][k] * inv_den, -mi[k][k] * inv_den   # 1/pivot
        for b in range(s):
            mr[k][b], mi[k][b] = _cmul(mr[k][b], mi[k][b], pr, pi)
            ir[k][b], ii[k][b] = _cmul(ir[k][b], ii[k][b], pr, pi)
        for a in range(s):
            if a == k:
                continue
            fr, fi = mr[a][k], mi[a][k]
            for b in range(s):
                dr, di = _cmul(fr, fi, mr[k][b], mi[k][b])
                mr[a][b] = mr[a][b] - dr
                mi[a][b] = mi[a][b] - di
                dr, di = _cmul(fr, fi, ir[k][b], ii[k][b])
                ir[a][b] = ir[a][b] - dr
                ii[a][b] = ii[a][b] - di
    return ir, ii


def constraint_space_apply(solvers, sr, si, eye, xsr, xsi,
                           c_rows_r, c_rows_i, xc_r, xc_i,
                           m: int, s_cap: int, refine: bool):
    """Shared constraint-space LCMV core (lcmv.cpp:108-138), given a
    Cholesky factor already installed in the ``solvers`` closures: solve
    X_a = R^-1 C_a into the ``xs`` scratch (refined like the dense path
    when ``refine``), form the masked inner matrix C^H X with the
    zero-column identity guard, invert it (Gauss-Jordan + one residual
    polish — the dense path's Newton-polished inverse), and apply
    w = sum_b X_b v_b to the frame spectra. Returns y = w^H x as
    (re, im) (1, 1, NIB) rows. Used by the three-stage kernel below AND
    the mega kernel (kernels/mega_stream.py) — one copy of the algebra."""
    fwd_solve, bwd_solve, refined_solve = solvers
    nib = sr.shape[-1]

    # X_a = R^-1 C_a per slot
    for a in range(s_cap):
        if refine:
            x_r, x_i = refined_solve(sr, si, eye,
                                     c_rows_r[a], c_rows_i[a])
        else:
            zr_, zi_ = fwd_solve(c_rows_r[a], c_rows_i[a])
            x_r, x_i = bwd_solve(zr_, zi_)
        xsr[a:a + 1] = x_r
        xsi[a:a + 1] = x_i

    # inner[a][b] = C_a^H X_b ; masked identity on zero columns
    inr = [[None] * s_cap for _ in range(s_cap)]
    ini = [[None] * s_cap for _ in range(s_cap)]
    for a in range(s_cap):
        colnorm = jnp.sum(c_rows_r[a] * c_rows_r[a]
                          + c_rows_i[a] * c_rows_i[a],
                          axis=1, keepdims=True)           # (1,1,nib)
        for b in range(s_cap):
            pr, pi = _cmul_conj(xsr[b:b + 1], xsi[b:b + 1],
                                c_rows_r[a], c_rows_i[a])
            inr[a][b] = jnp.sum(pr, axis=1, keepdims=True)
            ini[a][b] = jnp.sum(pi, axis=1, keepdims=True)
        inr[a][a] = inr[a][a] + jnp.where(colnorm == 0.0, 1.0, 0.0)

    ivr, ivi = _small_gj_inverse(inr, ini, s_cap)
    # v = G^-1 e0, then one residual refinement
    v_r = [ivr[a][0] for a in range(s_cap)]
    v_i = [ivi[a][0] for a in range(s_cap)]
    res_r, res_i = [], []
    for a in range(s_cap):
        acc_r = v_r[0] * 0 + (1.0 if a == 0 else 0.0)
        acc_i = v_i[0] * 0
        for b in range(s_cap):
            dr, di = _cmul(inr[a][b], ini[a][b], v_r[b], v_i[b])
            acc_r = acc_r - dr
            acc_i = acc_i - di
        res_r.append(acc_r)
        res_i.append(acc_i)
    for a in range(s_cap):
        for b in range(s_cap):
            dr, di = _cmul(ivr[a][b], ivi[a][b], res_r[b], res_i[b])
            v_r[a] = v_r[a] + dr
            v_i[a] = v_i[a] + di

    # w = sum_b X_b v_b ; y = w^H x
    w_r = jnp.zeros((1, m, nib), jnp.float32)
    w_i = jnp.zeros((1, m, nib), jnp.float32)
    for b in range(s_cap):
        dr, di = _cmul(xsr[b:b + 1], xsi[b:b + 1], v_r[b], v_i[b])
        w_r = w_r + dr
        w_i = w_i + di
    yr_, yi_ = _cmul_conj(xc_r, xc_i, w_r, w_i)
    return (jnp.sum(yr_, axis=1, keepdims=True),
            jnp.sum(yi_, axis=1, keepdims=True))


def _kernel(act_ref,
            xc_r_ref, xc_i_ref, xo_r_ref, xo_i_ref,
            c_r_ref, c_i_ref,
            y_r_ref, y_i_ref,
            sr, si, gr, gi, ar, ai, ur, ui, xsr, xsi, linv_ref,
            *, m: int, s_cap: int, w_hist: int, fb: int,
            per_frame_c: bool, refine: bool, exact_epochs: bool):
    step = pl.program_id(0)
    nib = sr.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m, nib), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m, nib), 1)
    eye = (rows == cols).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, m, nib), 1)

    @pl.when(step == 0)
    def _():
        sr[:] = jnp.zeros(sr.shape, jnp.float32)
        si[:] = jnp.zeros(si.shape, jnp.float32)
        gr[:] = jnp.zeros(gr.shape, jnp.float32)
        gi[:] = jnp.zeros(gi.shape, jnp.float32)

    fwd_solve, bwd_solve, refined_solve = make_solvers(ur, ui, linv_ref,
                                                       sub, m)

    for f in range(fb):
        t = step * fb + f

        if exact_epochs:
            @pl.when((t > 0) & (t % w_hist == 0))
            def _():
                sr[:] = gr[:]
                si[:] = gi[:]
                gr[:] = jnp.zeros(gr.shape, jnp.float32)
                gi[:] = jnp.zeros(gi.shape, jnp.float32)

        @pl.when(act_ref[t] != 0)
        def _solve():
            ar[:] = sr[:] + 0.001 * (eye * sr[:])
            ai[:] = si[:] + 0.001 * (eye * si[:])
            cholesky_factor(ar, ai, ur, ui, linv_ref, m)

            fi_ = f if per_frame_c else 0
            c_rows_r = [c_r_ref[fi_, a:a + 1, :, :] for a in range(s_cap)]
            c_rows_i = [c_i_ref[fi_, a:a + 1, :, :] for a in range(s_cap)]
            y_r, y_i = constraint_space_apply(
                (fwd_solve, bwd_solve, refined_solve), sr, si, eye,
                xsr, xsi, c_rows_r, c_rows_i,
                xc_r_ref[f:f + 1], xc_i_ref[f:f + 1], m, s_cap, refine)
            y_r_ref[f:f + 1] = y_r
            y_i_ref[f:f + 1] = y_i

        @pl.when(act_ref[t] == 0)
        def _silent():
            y_r_ref[f:f + 1] = jnp.zeros((1, 1, nib), jnp.float32)
            y_i_ref[f:f + 1] = jnp.zeros((1, 1, nib), jnp.float32)

        sliding_update(sr, si, gr, gi,
                       xc_r_ref[f:f + 1], xc_i_ref[f:f + 1],
                       xo_r_ref[f:f + 1], xo_i_ref[f:f + 1],
                       m, exact_epochs)


def lcmv_stream_pallas(x_ext, c_uniq, inact, idx, act, w_hist: int,
                       refine: bool = True, interpret: bool = False,
                       frames_per_step: int = FRAMES_PER_STEP,
                       exact_epochs: bool = True):
    """Run the fused streaming LCMV solve over T frames.

    x_ext:  (W+T, M, NIB) complex — history frames then current frames
            (the W history frames replay as in-kernel warm-up updates).
    c_uniq: (U, S, M, NIB) complex constraint sets per unique control row
            (inactive slots all-zero — detected in-kernel per bin).
    inact:  accepted for signature parity with the dense path; the kernel
            derives inactivity from the zero columns.
    idx:    (T,) int32 — control-row index per frame.
    act:    (T,) int32/bool — energy-gate activity per frame.
    Returns y (T, NIB) complex (zeros on silent frames).
    """
    del inact
    yr, yi = lcmv_stream_planes_pallas(
        x_ext.real, x_ext.imag, c_uniq.real, c_uniq.imag, idx, act,
        w_hist=w_hist, refine=refine, interpret=interpret,
        frames_per_step=frames_per_step, exact_epochs=exact_epochs)
    return jax.lax.complex(yr, yi)


def lcmv_stream_planes_pallas(xr_ext, xi_ext, cr_uniq, ci_uniq, idx, act,
                              w_hist: int, refine: bool = True,
                              interpret: bool = False,
                              frames_per_step: int = FRAMES_PER_STEP,
                              exact_epochs: bool = True):
    """Split re/im plane variant (see mvdr_stream_planes_pallas)."""
    wt, m, nib = xr_ext.shape
    t = wt - w_hist
    fb = frames_per_step
    tw = w_hist + t
    tp = -(-tw // fb) * fb
    nibp = -(-nib // 128) * 128
    u, s_cap = cr_uniq.shape[:2]
    per_frame_c = u > 1

    def pad3(a, n0):
        return jnp.pad(a, ((0, n0 - a.shape[0]), (0, 0), (0, nibp - nib)))

    def pad4(a, n0):
        return jnp.pad(a, ((0, n0 - a.shape[0]), (0, 0), (0, 0),
                           (0, nibp - nib)))

    zeros_w = jnp.zeros((w_hist,) + xr_ext.shape[1:], xr_ext.dtype)
    xc_r, xc_i = pad3(xr_ext, tp), pad3(xi_ext, tp)
    xo_r = pad3(jnp.concatenate([zeros_w, xr_ext[:t]], axis=0), tp)
    xo_i = pad3(jnp.concatenate([zeros_w, xi_ext[:t]], axis=0), tp)
    act = jnp.concatenate([jnp.zeros((w_hist,), jnp.int32),
                           act.astype(jnp.int32)])
    act = jnp.pad(act, (0, tp - tw))
    if per_frame_c:
        c_tr = cr_uniq[idx]                            # (T, S, M, NIB)
        c_ti = ci_uniq[idx]
        zw = jnp.zeros((w_hist,) + c_tr.shape[1:], c_tr.dtype)
        c_r = pad4(jnp.concatenate([zw, c_tr], axis=0), tp)
        c_i = pad4(jnp.concatenate([zw, c_ti], axis=0), tp)
        c_spec = pl.BlockSpec((fb, s_cap, m, nibp), lambda i, a: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        c_r, c_i = pad4(cr_uniq, 1), pad4(ci_uniq, 1)
        c_spec = pl.BlockSpec((1, s_cap, m, nibp), lambda i, a: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, m=m, s_cap=s_cap, w_hist=w_hist,
                               fb=fb, per_frame_c=per_frame_c,
                               refine=refine, exact_epochs=exact_epochs)
    frame_spec = pl.BlockSpec((fb, m, nibp), lambda i, a: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((fb, 1, nibp), lambda i, a: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tp // fb,),
        in_specs=[frame_spec, frame_spec, frame_spec, frame_spec,
                  c_spec, c_spec],
        out_specs=[out_spec, out_spec],
        scratch_shapes=(
            [pltpu.VMEM((m, m, nibp), jnp.float32)] * 8
            + [pltpu.VMEM((s_cap, m, nibp), jnp.float32)] * 2
            + [pltpu.VMEM((m, 1, nibp), jnp.float32)]
        ),
    )
    yr, yi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((tp, 1, nibp), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(act, xc_r, xc_i, xo_r, xo_i, c_r, c_i)
    return yr[w_hist:tw, 0, :nib], yi[w_hist:tw, 0, :nib]
