"""Fused streaming MVDR solve kernel.

Replaces the dense block pipeline's four HBM-bound stages (outer products ->
banded sliding sums -> batched inverse -> apply einsums) with ONE Pallas
kernel that marches the frame axis. Reference semantics (mvdr.cpp:84-114):
per frame, per in-band bin, R = (P P^H) .* whiteR over the ``past_windows``
FFTs BEFORE this frame, w = R^-1 d / (d^H R^-1 d), y = w^H x — history
shifts every frame, solves only happen where the energy gate passes.

TPU design:

- **Grid = frame blocks** (TPU grids run sequentially; FRAMES_PER_STEP
  frames per step amortize the ~4.5 us/step block-pipeline overhead), bins
  batched on lanes, matrices as (M, M, NIB) split re/im f32 planes (the
  proven layout of kernels/linalg.py).
- **Sliding covariance in VMEM**: S += x_t x_t^H - x_{t-W} x_{t-W}^H per
  frame (two rank-1 updates, no (M, M, T, NIB) tensor ever exists). A
  second additions-only accumulator G is reset every W frames and S <- G at
  epoch boundaries, so subtraction drift is bounded to W frames and the
  windowed sum stays exact to f32 rounding.
- **Per-frame gate skip**: the whole factor+solve runs under
  ``pl.when(act[t])`` — silent frames cost only the covariance update,
  which is the reference's own sparsity (its per-bin loop does no solve
  work below the gate).
- **Cholesky, not Gauss-Jordan**: R is Hermitian positive definite after
  the multiplicative 1.001 diagonal loading; a right-looking in-place
  factorization does ~m^3/3 work vs GJ's m^3, and the Hermitian row trick
  (A[k, i] = conj(A[i, k])) supplies every "column as row" the trailing
  update and the solves need — no sublane/lane transposes anywhere.
- **One iterative-refinement pass** (u += R^{-1}(d - R u) via the same
  factor) pins the f32 solve inside the framework's deviation budget; the
  covariances here are rank-deficient (W < M) and only the tiny loading
  keeps them PD, so a raw f32 triangular solve alone would lose ~kappa*eps.

Singular cold-start covariances produce inf/NaN like the reference's Eigen
``.inverse()`` garbage (parity scenes keep the first W hops below the gate).

Numerics vs the dense path: same math, different summation/solve order —
agreement is at f32 round-off (~1e-5 relative), not bit-exact; the float64
oracle parity contract lives on the dense/CPU path which is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES_PER_STEP = 2


def _cmul(ar, ai, br, bi):
    """(ar + i ai) * (br + i bi) -> (re, im)."""
    return ar * br - ai * bi, ar * bi + ai * br


def _cmul_conj(ar, ai, br, bi):
    """(ar + i ai) * conj(br + i bi) -> (re, im)."""
    return ar * br + ai * bi, ai * br - ar * bi


def _col_from_row(row_r, row_i, m):
    """(1, M, NIB) sublane-layout vector -> (M, 1, NIB) dim0-layout via M
    static size-1 sublane slices (no lane/sublane transpose)."""
    cr = jnp.concatenate([row_r[:, j:j + 1, :] for j in range(m)], axis=0)
    ci = jnp.concatenate([row_i[:, j:j + 1, :] for j in range(m)], axis=0)
    return cr, ci


def cholesky_factor(ar, ai, ur, ui, linv_ref, m):
    """Right-looking in-place Cholesky of the Hermitian A (ref pair ar/ai),
    storing U = L^H (rows of A scaled) and 1/L[k,k] (linv). Trailing blocks
    stay exactly Hermitian, so pivots are real and conj(col) is the pivot
    row. Stale columns i <= k are clobbered but never read again."""
    for k in range(m):
        piv = ar[k:k + 1, k:k + 1, :]                      # (1,1,nib)
        il = jax.lax.rsqrt(piv)
        ur[k:k + 1] = ar[k:k + 1] * il
        ui[k:k + 1] = ai[k:k + 1] * il
        linv_ref[k:k + 1] = il
        if k + 1 < m:
            pinv = 1.0 / piv
            rr2 = ar[k:k + 1] * pinv                        # (1,m,nib)
            ri2 = ai[k:k + 1] * pinv
            cr = ar[k + 1:, k:k + 1, :]                 # (m-k-1,1,nib)
            ci = ai[k + 1:, k:k + 1, :]
            ar[k + 1:] = ar[k + 1:] - (cr * rr2 - ci * ri2)
            ai[k + 1:] = ai[k + 1:] - (cr * ri2 + ci * rr2)


def cholesky_factor_inplace(ur, ui, linv_ref, m):
    """Right-looking Cholesky WITHOUT a separate workspace: ur/ui arrive
    holding the loaded Hermitian A and leave holding U = L^H (plus linv),
    saving the 2x(M, M, NIB) ar/ai scratch of :func:`cholesky_factor`.

    Row k is scaled in place (ur[k] = a_k / sqrt(piv)); the trailing-block
    update then recovers the unscaled pivot row as ur[k] * linv[k]
    (a_k / piv) — rows below k are still raw A values, so the column
    slice reads stay exact. Same arithmetic as cholesky_factor up to the
    piv-division order (a*pinv vs (a*il)*il, identical in f32 rounding
    only when piv is a power of two — in practice ~1 ulp)."""
    for k in range(m):
        piv = ur[k:k + 1, k:k + 1, :]                      # raw a[k,k]
        il = jax.lax.rsqrt(piv)
        ur[k:k + 1] = ur[k:k + 1] * il
        ui[k:k + 1] = ui[k:k + 1] * il
        linv_ref[k:k + 1] = il
        if k + 1 < m:
            rr2 = ur[k:k + 1] * il                          # = a_k / piv
            ri2 = ui[k:k + 1] * il
            cr = ur[k + 1:, k:k + 1, :]                 # (m-k-1,1,nib)
            ci = ui[k + 1:, k:k + 1, :]
            ur[k + 1:] = ur[k + 1:] - (cr * rr2 - ci * ri2)
            ui[k + 1:] = ui[k + 1:] - (cr * ri2 + ci * rr2)


def make_solvers(ur, ui, linv_ref, sub, m):
    """Triangular solve closures over the stored factor U = L^H."""

    def fwd_solve(br_, bi_):
        """L z = b: z, b sublane-layout (1, M, NIB)."""
        zr_, zi_ = br_, bi_
        for k in range(m):
            il = linv_ref[k:k + 1]                          # (1,1,nib)
            zkr = zr_[:, k:k + 1, :] * il
            zki = zi_[:, k:k + 1, :] * il
            ukr = ur[k:k + 1]
            uki = ui[k:k + 1]
            dr_, di_ = _cmul(zkr, zki, ukr, -uki)
            zr_ = jnp.where(sub == k, zkr,
                            jnp.where(sub > k, zr_ - dr_, zr_))
            zi_ = jnp.where(sub == k, zki,
                            jnp.where(sub > k, zi_ - di_, zi_))
        return zr_, zi_

    def bwd_solve(zr_, zi_):
        """U u = z: u, z sublane-layout (1, M, NIB)."""
        ur_out = jnp.zeros_like(zr_)
        ui_out = jnp.zeros_like(zi_)
        for k in range(m - 1, -1, -1):
            ukr = ur[k:k + 1]
            uki = ui[k:k + 1]
            pr, pi = _cmul(ukr, uki, ur_out, ui_out)
            mask = sub > k
            s_r = jnp.sum(jnp.where(mask, pr, 0.0), axis=1, keepdims=True)
            s_i = jnp.sum(jnp.where(mask, pi, 0.0), axis=1, keepdims=True)
            il = linv_ref[k:k + 1]
            vkr = (zr_[:, k:k + 1, :] - s_r) * il
            vki = (zi_[:, k:k + 1, :] - s_i) * il
            ur_out = jnp.where(sub == k, vkr, ur_out)
            ui_out = jnp.where(sub == k, vki, ui_out)
        return ur_out, ui_out

    def refined_solve(sr, si, eye, br_, bi_):
        """R^-1 b with one iterative-refinement pass; R recomputed from the
        covariance accumulator S as S + 0.001*diag(S) on the fly."""
        zr_, zi_ = fwd_solve(br_, bi_)
        u_r, u_i = bwd_solve(zr_, zi_)
        rr_ = sr[:] + 0.001 * (eye * sr[:])
        ri_ = si[:] + 0.001 * (eye * si[:])
        pr, pi = _cmul(rr_, ri_, u_r, u_i)                  # bcast dim0
        rv_r = jnp.sum(pr, axis=1, keepdims=True)           # (m,1,nib)
        rv_i = jnp.sum(pi, axis=1, keepdims=True)
        dc_r, dc_i = _col_from_row(br_, bi_, m)
        res_c_r = dc_r - rv_r
        res_c_i = dc_i - rv_i
        res_r = jnp.concatenate(
            [res_c_r[j:j + 1] for j in range(m)], axis=1)
        res_i = jnp.concatenate(
            [res_c_i[j:j + 1] for j in range(m)], axis=1)
        zr2, zi2 = fwd_solve(res_r, res_i)
        cr2, ci2 = bwd_solve(zr2, zi2)
        return u_r + cr2, u_i + ci2

    return fwd_solve, bwd_solve, refined_solve


def sliding_update(sr, si, gr, gi, xc_r, xc_i, xo_r, xo_i, m,
                   exact_epochs):
    """S += outer(xc) - outer(xo); G += outer(xc) (epoch insurance)."""
    cc_r, cc_i = _col_from_row(xc_r, xc_i, m)
    co_r, co_i = _col_from_row(xo_r, xo_i, m)
    sliding_update_cols(sr, si, gr, gi, cc_r, cc_i, xc_r, xc_i,
                        co_r, co_i, xo_r, xo_i, exact_epochs)


def sliding_update_cols(sr, si, gr, gi, cc_r, cc_i, xc_r, xc_i,
                        co_r, co_i, xo_r, xo_i, exact_epochs):
    """:func:`sliding_update` with the column-layout vectors precomputed.

    The per-frame _col_from_row is 2 x M small concat-slices — callers that
    march many frames per grid step (kernels/mega_stream.py) batch the
    column extraction once per block and keep a column-layout ring, leaving
    only the wide outer-product and accumulate ops in the serial chain."""
    # outer(x)[j,i] = x[j] * conj(x[i]); the row holds unconjugated x[i]
    nc_r, nc_i = _cmul_conj(cc_r, cc_i, xc_r, xc_i)         # (m,m,nib)
    no_r, no_i = _cmul_conj(co_r, co_i, xo_r, xo_i)
    sr[:] = sr[:] + (nc_r - no_r)
    si[:] = si[:] + (nc_i - no_i)
    if exact_epochs:
        gr[:] = gr[:] + nc_r
        gi[:] = gi[:] + nc_i



def _kernel(act_ref,
            xc_r_ref, xc_i_ref, xo_r_ref, xo_i_ref,
            d_r_ref, d_i_ref,
            y_r_ref, y_i_ref,
            sr, si, gr, gi, ar, ai, ur, ui, linv_ref,
            *, m: int, w_hist: int, fb: int, per_frame_d: bool,
            refine: bool, exact_epochs: bool):
    step = pl.program_id(0)
    nib = sr.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m, nib), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m, nib), 1)
    eye = (rows == cols).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, m, nib), 1)

    # S and G start empty; the W prepended warm-up frames (update-only,
    # act=0) accumulate the history so the first real frame's epoch reset
    # S <- G lands on the exact window — no separate S0 input needed.
    @pl.when(step == 0)
    def _():
        sr[:] = jnp.zeros(sr.shape, jnp.float32)
        si[:] = jnp.zeros(si.shape, jnp.float32)
        gr[:] = jnp.zeros(gr.shape, jnp.float32)
        gi[:] = jnp.zeros(gi.shape, jnp.float32)

    fwd_solve, bwd_solve, refined_solve = make_solvers(ur, ui, linv_ref,
                                                       sub, m)

    for f in range(fb):                         # static frames-per-step loop
        t = step * fb + f

        if exact_epochs:
            # epoch-exact reset: at frame t = k*W the additions-only G
            # holds exactly sum(outer(x_{t-W..t-1})) == the window S needs
            @pl.when((t > 0) & (t % w_hist == 0))
            def _():
                sr[:] = gr[:]
                si[:] = gi[:]
                gr[:] = jnp.zeros(gr.shape, jnp.float32)
                gi[:] = jnp.zeros(gi.shape, jnp.float32)

        @pl.when(act_ref[t] != 0)
        def _solve():
            # R = S .* (ones + 0.001 I)  (mvdr.cpp:239-243 whiteR),
            # formed straight into the factorization scratch
            ar[:] = sr[:] + 0.001 * (eye * sr[:])
            ai[:] = si[:] + 0.001 * (eye * si[:])
            cholesky_factor(ar, ai, ur, ui, linv_ref, m)

            if per_frame_d:
                d_r = d_r_ref[f:f + 1]                          # (1,m,nib)
                d_i = d_i_ref[f:f + 1]
            else:
                d_r = d_r_ref[:]
                d_i = d_i_ref[:]
            if refine:
                u_r, u_i = refined_solve(sr, si, eye, d_r, d_i)
            else:
                zr_, zi_ = fwd_solve(d_r, d_i)
                u_r, u_i = bwd_solve(zr_, zi_)

            # den = d^H u ; y = w^H x = (sum_i conj(u_i) x_i) / conj(den)
            nr, ni = _cmul_conj(u_r, u_i, d_r, d_i)
            den_r = jnp.sum(nr, axis=1, keepdims=True)          # (1,1,nib)
            den_i = jnp.sum(ni, axis=1, keepdims=True)
            xc_r = xc_r_ref[f:f + 1]
            xc_i = xc_i_ref[f:f + 1]
            yr_, yi_ = _cmul_conj(xc_r, xc_i, u_r, u_i)
            num_r = jnp.sum(yr_, axis=1, keepdims=True)
            num_i = jnp.sum(yi_, axis=1, keepdims=True)
            scale = 1.0 / (den_r * den_r + den_i * den_i)
            y_r_ref[f:f + 1] = (num_r * den_r - num_i * den_i) * scale
            y_i_ref[f:f + 1] = (num_i * den_r + num_r * den_i) * scale

        @pl.when(act_ref[t] == 0)
        def _silent():
            y_r_ref[f:f + 1] = jnp.zeros((1, 1, nib), jnp.float32)
            y_i_ref[f:f + 1] = jnp.zeros((1, 1, nib), jnp.float32)

        # sliding-window update (always: history shifts regardless of the
        # gate, mvdr.cpp:100-101)
        sliding_update(sr, si, gr, gi,
                       xc_r_ref[f:f + 1], xc_i_ref[f:f + 1],
                       xo_r_ref[f:f + 1], xo_i_ref[f:f + 1],
                       m, exact_epochs)


def mvdr_stream_pallas(x_ext, d_uniq, w_idx, act, w_hist: int,
                       refine: bool = True, interpret: bool = False,
                       frames_per_step: int = FRAMES_PER_STEP,
                       exact_epochs: bool = True):
    """Run the fused streaming MVDR solve over T frames.

    x_ext:  (W+T, M, NIB) complex — history frames then current frames.
            The W history frames are replayed as in-kernel warm-up updates
            (solves gated off), so no covariance snapshot input is needed.
    d_uniq: (U, M, NIB) complex steering vectors.
    w_idx:  (T,) int32 — steering index per frame (U == 1 hits the
            constant-steering fast path; otherwise d is pre-gathered per
            frame outside the kernel).
    act:    (T,) int32/bool — energy-gate activity per frame (any bin).
    Returns y (T, NIB) complex: beamformed spectra on active frames, zeros
    on silent frames (callers overlay the 0.01 passthrough per bin).
    """
    yr, yi = mvdr_stream_planes_pallas(
        x_ext.real, x_ext.imag, d_uniq.real, d_uniq.imag, w_idx, act,
        w_hist=w_hist, refine=refine, interpret=interpret,
        frames_per_step=frames_per_step, exact_epochs=exact_epochs)
    return jax.lax.complex(yr, yi)


def mvdr_stream_planes_pallas(xr_ext, xi_ext, dr_uniq, di_uniq, w_idx, act,
                              w_hist: int, refine: bool = True,
                              interpret: bool = False,
                              frames_per_step: int = FRAMES_PER_STEP,
                              exact_epochs: bool = True):
    """Split re/im plane variant — producers that already hold f32 planes
    (the fused WOLA analysis kernel) skip the complex materialization.
    Returns (y_r, y_i) (T, NIB) f32 planes."""
    wt, m, nib = xr_ext.shape
    t = wt - w_hist
    fb = frames_per_step
    # warm-up frames first: the current-stream index w of warm-up frame w
    # is x_ext[w]; its old-stream partner is zero (the window grows from
    # empty); real frame g is current x_ext[g+W] / old x_ext[g]
    tw = w_hist + t
    tp = -(-tw // fb) * fb
    nibp = -(-nib // 128) * 128
    u = dr_uniq.shape[0]
    per_frame_d = u > 1

    def pad3(a, n0):
        return jnp.pad(a, ((0, n0 - a.shape[0]), (0, 0),
                           (0, nibp - nib)))

    zeros_w = jnp.zeros((w_hist,) + xr_ext.shape[1:], xr_ext.dtype)
    xc_r, xc_i = pad3(xr_ext, tp), pad3(xi_ext, tp)
    xo_r = pad3(jnp.concatenate([zeros_w, xr_ext[:t]], axis=0), tp)
    xo_i = pad3(jnp.concatenate([zeros_w, xi_ext[:t]], axis=0), tp)
    act = jnp.concatenate([jnp.zeros((w_hist,), jnp.int32),
                           act.astype(jnp.int32)])
    act = jnp.pad(act, (0, tp - tw))
    if per_frame_d:
        d_tr = dr_uniq[w_idx]                                # (T, M, NIB)
        d_ti = di_uniq[w_idx]
        zw = jnp.zeros((w_hist,) + d_tr.shape[1:], d_tr.dtype)
        d_r = pad3(jnp.concatenate([zw, d_tr], axis=0), tp)
        d_i = pad3(jnp.concatenate([zw, d_ti], axis=0), tp)
        d_spec = pl.BlockSpec((fb, m, nibp), lambda i, a: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        d_r, d_i = pad3(dr_uniq, 1), pad3(di_uniq, 1)
        d_spec = pl.BlockSpec((1, m, nibp), lambda i, a: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, m=m, w_hist=w_hist, fb=fb,
                               per_frame_d=per_frame_d, refine=refine,
                               exact_epochs=exact_epochs)
    frame_spec = pl.BlockSpec((fb, m, nibp), lambda i, a: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((fb, 1, nibp), lambda i, a: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tp // fb,),
        in_specs=[frame_spec, frame_spec, frame_spec, frame_spec,
                  d_spec, d_spec],
        out_specs=[out_spec, out_spec],
        scratch_shapes=(
            [pltpu.VMEM((m, m, nibp), jnp.float32)] * 8
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
    )(act, xc_r, xc_i, xo_r, xo_i, d_r, d_i)
    return yr[w_hist:tw, 0, :nib], yi[w_hist:tw, 0, :nib]
