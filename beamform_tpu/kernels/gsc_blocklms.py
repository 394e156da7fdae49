"""Block-LMS GSC adaptive stage: delayed filter updates, MXU throughput.

EXPLICITLY NON-FAITHFUL (``GscParams.solver="blocklms"``). The reference
updates the FIR bank after every sample (gsc.cpp:162-169, ``g += mu*e*u``),
which is irreducibly serial: round-3 measurements pinned the exact
recurrence at ~410x aggregate on TPU (docs/ROADMAP.md item 1 — three built
kernels, two measured disproofs). This kernel changes the update SEMANTICS
instead of the schedule: the filter bank is frozen for a block of L = 128
samples, every per-sample quantity of the reference (output, dynamic mu,
VAD gate, NaN scrub) is computed against the frozen filter, and the L
accumulated rank-1 updates land at once at the block boundary — classic
block LMS with the reference's per-sample step-size rule kept intact.
Divergence from faithful output is bounded by the <=127-sample filter
staleness and measured as SIR-gain parity in tests/test_gsc_blocklms.py.

What freezing buys on TPU: with the filter constant over a block, the
forward pass is a plain FIR convolution and the accumulated gradient is a
cross-correlation — both become DFT-256 overlap-save MATMULS on the MXU
instead of a 128-step serial VPU chain:

  per block (u_cat = [K-sample history | L new u samples], 256 lanes):
    U  = DFT_256(u_cat)                                (2 MXU dots)
    H  = filt @ E          E[k,f] = W_256^{f(K-1-k)}   (2 dots; the tap
                           reversal is folded into the constant)
    y  = last L of IDFT(U*H)  -> out = das - sum_c y   (2 dots + 1 dot)
    mu[c,j], VAD gate: exact windowed power sums over the last K outputs
    / K u-samples via in-register prefix sums (VPU)    (no serial chain:
                           outputs are known for the whole block at once)
    w  = mu * out;  W = DFT(w_pad)                     (2 dots)
    grad = lanes 1..K of IDFT(conj(W)*U)               (2 dots)
    filt += grad; NaN scrub; registers <- last L samples

All dots are 3-pass bf16 (:func:`wola_pallas._dot3`). Streams batch on the
matmul M dimension (B*C rows), so aggregate throughput scales with batch
until the MXU saturates — the opposite regime from the per-sample kernel,
whose cost is instruction issue.

Block-size study (``GscParams.block_samples``, round-5 on-chip sweep,
16 mics, 30 s): the serial chain shrinks ~l/128-fold but per-sample DFT
work grows as (K+l)^2/l, so single-stream xRT is 689/779/805/721 at
l=128/256/512/1024 — l=512 is the measured single-stream optimum. At
batch 32 the MXU already sees 480 rows and extra FLOPs only hurt
(1175 vs 1145 aggregate at 128 vs 512), so 128 stays the default.
Measured single-stream ceiling of this formulation: ~805x — each block
step issues ~10 three-pass dots whose M dimension is B*(M-1)=15 rows
against (K+l)-wide DFT matrices, i.e. the MXU runs at ~12% row
occupancy and the chain is latency-bound; closing the last 1.25x to the
1000x bar would need an rFFT-factorized DFT (half the matrix width) or
cross-block pipelining that breaks the update ordering — the same
"different math, not a schedule" boundary as the faithful path's 410x
disproof (docs/ROADMAP.md item 1).

The pure-JAX reference formulation (:func:`gsc_blocklms_scan`) is the CPU
fallback and the kernel's bit-level test oracle.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beamform_tpu.config import GscParams
from beamform_tpu.kernels.wola_pallas import _bf16_pair, _dot3

_HP = jax.lax.Precision.HIGHEST
K = 128          # filter taps (reference default, gsc.cpp:219)
L = 128          # default block length = taps (classic block-LMS choice)
VALID_BLOCKS = (128, 256, 512, 1024)   # GscParams.block_samples choices


def _block_len(params: GscParams) -> int:
    l = int(getattr(params, "block_samples", L) or L)
    if l not in VALID_BLOCKS:
        raise ValueError(
            f"block_samples={l} unsupported; choose one of {VALID_BLOCKS}")
    return l


@lru_cache(maxsize=8)
def _dft_consts(l: int = L):
    """DFT-(K+l) overlap-save constants with the kernel's index
    conventions baked in, as stacked bf16 hi/lo pairs for the 3-pass
    dots. ``l`` is the block length: the filter stays frozen for ``l``
    samples, so larger blocks cut the serial chain ~l/128-fold at the
    cost of up-to-(l-1)-sample filter staleness."""
    n = K + l
    i = np.arange(n)
    f = np.arange(n)
    ang = -2.0 * np.pi * np.outer(i, f) / n
    dre, dim = np.cos(ang), np.sin(ang)                  # (n, n)
    # H(f) = sum_k filt[k] W^{f(K-1-k)}: reversal folded into E
    k = np.arange(K)
    ange = -2.0 * np.pi * np.outer(K - 1 - k, f) / n
    er, ei = np.cos(ange), np.sin(ange)                  # (K, n)
    # forward IDFT, real part, output lanes n = K..K+l-1 (the l new
    # samples; lanes >= K-1 are wrap-free in the circular conv)
    n_out = np.arange(l) + K
    angj = 2.0 * np.pi * np.outer(f, n_out) / n
    jc, js = np.cos(angj) / n, np.sin(angj) / n          # (n, l)
    # gradient IDFT, real part, correlation lags m = 1..K
    m_lag = np.arange(K) + 1
    angk = 2.0 * np.pi * np.outer(f, m_lag) / n
    kc, ks = np.cos(angk) / n, np.sin(angk) / n          # (n, K)
    return tuple(_bf16_pair(a.astype(np.float32))
                 for a in (dre, dim, er, ei, jc, js, kc, ks))


@lru_cache(maxsize=8)
def _group_consts(bsz: int, c: int):
    """Exact 0/1 channel-group sum (B, B*C) and broadcast (B*C, B) maps."""
    sm = np.zeros((bsz, bsz * c), np.float32)
    for b in range(bsz):
        sm[b, b * c:(b + 1) * c] = 1.0
    return sm, sm.T.copy()


def _prefix_lanes(x):
    """Inclusive prefix sum along the lane axis (log-shift rounds)."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = x
    sh = 1
    while sh < n:
        s = s + jnp.where(lane >= sh, pltpu.roll(s, sh, x.ndim - 1), 0.0)
        sh *= 2
    return s


def _kernel(u_ref, das_ref, blk_in, flt_in, lo_in,
            dre, dim, er, ei, jc, js, kc, ks, sm, xp,
            out_ref, blk_out, flt_out, lo_out,
            blkreg, flt, lo, *, params: GscParams, chunk: int, bsz: int,
            l: int):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        blkreg[:] = blk_in[:]
        flt[:] = flt_in[:]
        lo[:] = lo_in[:]

    kinv = np.float32(1.0 / K)
    c_b = np.float32(params.mu0 * params.mu0)
    c_o = np.float32(params.mu_max * params.mu_max)
    mu0 = np.float32(params.mu0)

    for sub in range(chunk // l):
        u_tile = u_ref[:, sub * l:(sub + 1) * l]          # (BC, l)
        das_t = das_ref[:, sub * l:(sub + 1) * l]         # (B, l)
        ucat = jnp.concatenate([blkreg[:], u_tile], axis=1)   # (BC, K+l)

        # forward FIR with the frozen filter (overlap-save)
        ur = _dot3(ucat, dre[:])
        ui = _dot3(ucat, dim[:])
        hr = _dot3(flt[:], er[:])
        hi = _dot3(flt[:], ei[:])
        yr = ur * hr - ui * hi
        yi = ur * hi + ui * hr
        ych = _dot3(yr, jc[:]) - _dot3(yi, js[:])         # (BC, l)
        fir = jnp.dot(sm[:], ych, precision=_HP,
                      preferred_element_type=jnp.float32)  # (B, l)
        out = das_t - fir

        # exact windowed power sums (the reference's K-sample registers,
        # gsc.cpp:146-157) — vectorized over the block, no serial chain
        fo = jnp.concatenate([lo[:], out], axis=1)        # (B, K+l)
        posq = _prefix_lanes(fo * fo)
        osq = posq[:, K:] - posq[:, :l]                   # (B, l)
        pbsq = _prefix_lanes(ucat * ucat)
        bsq = pbsq[:, K:] - pbsq[:, :l]                   # (BC, l)

        osq_bc = jnp.dot(xp[:], osq, precision=_HP,
                         preferred_element_type=jnp.float32)
        out_bc = jnp.dot(xp[:], out, precision=_HP,
                         preferred_element_type=jnp.float32)

        # dynamic mu, squared-domain gate (same arithmetic as the faithful
        # kernels — see models/gsc.py:gsc_sample_step)
        cond = c_b * bsq < c_o * osq_bc
        p_raw = mu0 * jax.lax.rsqrt(jnp.maximum(osq_bc * kinv, 0.0))
        p = jnp.where(p_raw < jnp.inf, p_raw, 0.0)
        q_raw = mu0 * jax.lax.rsqrt(jnp.maximum(bsq * kinv, 0.0))
        q = jnp.where(q_raw < jnp.inf, q_raw, 0.0)
        mu = jnp.where(cond, p, q)
        if params.use_vad:
            last_pow = jnp.sqrt(jnp.maximum(osq_bc * kinv, 0.0))
            mu = jnp.where(last_pow < params.vad_threshold, mu, 0.0)

        # accumulated gradient = cross-correlation of (mu*e) with u
        w = mu * out_bc                                   # (BC, l)
        wr = _dot3(w, dre[:, 0:l, :])
        wi = _dot3(w, dim[:, 0:l, :])
        gr = wr * ur + wi * ui
        gi = wr * ui - wi * ur
        grad = _dot3(gr, kc[:]) - _dot3(gi, ks[:])        # (BC, K)

        fnew = flt[:] + grad
        flt[:] = jnp.where(jnp.isnan(fnew), 0.0, fnew)
        # registers <- the K most recent samples (l == K: the whole tile)
        blkreg[:] = u_tile if l == K else u_tile[:, l - K:]
        lo[:] = out if l == K else out[:, l - K:]
        out_ref[:, sub * l:(sub + 1) * l] = out

    @pl.when(step == nsteps - 1)
    def _():
        blk_out[:] = blkreg[:]
        flt_out[:] = flt[:]
        lo_out[:] = lo[:]


def gsc_blocklms_pallas_batched(aligned, block, filt, last_out,
                                params: GscParams, chunk: int = 1024,
                                interpret: bool = False):
    """Block-LMS adaptive stage for a batch of streams.

    aligned: (B, M, S) float32, S % chunk == 0; block/filt: (B, M-1, K);
    last_out: (B, K). Returns (out (B, S), block', filt', last_out').
    """
    bsz, m, s = aligned.shape
    c = m - 1
    l = _block_len(params)
    assert chunk % l == 0 and s % chunk == 0, (s, chunk, l)
    assert filt.shape[-1] == K, "blocklms requires the 128-tap default"
    f32 = jnp.float32
    u = (aligned[:, 1:, :] - aligned[:, :-1, :]).astype(f32)
    u = u.reshape(bsz * c, s)
    das = jnp.mean(aligned, axis=1).astype(f32)           # (B, S)
    consts = [jnp.asarray(a) for a in _dft_consts(l)]
    sm, xp = _group_consts(bsz, c)

    nsteps = s // chunk
    kernel = functools.partial(_kernel, params=params, chunk=chunk,
                               bsz=bsz, l=l)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out, blk_o, flt_o, lo_o = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((bsz * c, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            full((bsz * c, K)), full((bsz * c, K)), full((bsz, K)),
            *(full(cst.shape) for cst in consts),
            full(sm.shape), full(xp.shape),
        ],
        out_specs=[
            pl.BlockSpec((bsz, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            full((bsz * c, K)), full((bsz * c, K)), full((bsz, K)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s), f32),
            jax.ShapeDtypeStruct((bsz * c, K), f32),
            jax.ShapeDtypeStruct((bsz * c, K), f32),
            jax.ShapeDtypeStruct((bsz, K), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz * c, K), f32),
            pltpu.VMEM((bsz * c, K), f32),
            pltpu.VMEM((bsz, K), f32),
        ],
        interpret=interpret,
    )(u, das, block.reshape(bsz * c, K).astype(f32),
      filt.reshape(bsz * c, K).astype(f32), last_out.astype(f32),
      *consts, jnp.asarray(sm), jnp.asarray(xp))
    return (out.reshape(bsz, -1), blk_o.reshape(bsz, c, K),
            flt_o.reshape(bsz, c, K), lo_o)


# ---------------------------------------------------------------------------
# pure-JAX reference formulation (CPU fallback + kernel test oracle)

def gsc_blocklms_scan(aligned, block, filt, last_out, params: GscParams):
    """Single-stream block-LMS: aligned (M, S) with S % block_samples == 0;
    block/filt (M-1, K); last_out (K,). Same semantics as the kernel in
    f32/f64 XLA math. Returns (out (S,), block', filt', last_out')."""
    m, s = aligned.shape
    c = m - 1
    k = filt.shape[-1]
    l = _block_len(params)
    assert k == K and s % l == 0, (k, s, l)
    rd = aligned.dtype
    u = aligned[1:] - aligned[:-1]                        # (C, S)
    das = jnp.mean(aligned, axis=0)                       # (S,)
    nb = s // l
    u_blocks = jnp.moveaxis(u.reshape(c, nb, l), 1, 0)    # (nb, C, l)
    das_blocks = das.reshape(nb, l)
    idx = np.arange(l)[:, None] + np.arange(K)[None, :] + 1   # (l, K)

    kinv = rd.type(1.0 / k)
    c_b = rd.type(params.mu0 * params.mu0)
    c_o = rd.type(params.mu_max * params.mu_max)
    mu0 = rd.type(params.mu0)

    def step(carry, inp):
        blk, flt_c, lo = carry
        u_t, das_t = inp
        ucat = jnp.concatenate([blk, u_t], axis=1)        # (C, K+l)
        u3 = ucat[:, idx]                                 # (C, l, K)
        fir = jnp.einsum("cjk,ck->j", u3, flt_c, precision=_HP)
        out = das_t - fir                                 # (l,)

        fo = jnp.concatenate([lo, out])
        posq = jnp.cumsum(fo * fo)
        osq = posq[K:] - posq[:l]                         # (l,)
        pbsq = jnp.cumsum(ucat * ucat, axis=1)
        bsq = pbsq[:, K:] - pbsq[:, :l]                   # (C, l)

        cond = c_b * bsq < c_o * osq[None, :]
        p_raw = mu0 * jax.lax.rsqrt(jnp.maximum(osq * kinv, 0.0))
        p = jnp.where(p_raw < jnp.inf, p_raw, 0.0)
        q_raw = mu0 * jax.lax.rsqrt(jnp.maximum(bsq * kinv, 0.0))
        q = jnp.where(q_raw < jnp.inf, q_raw, 0.0)
        mu = jnp.where(cond, p[None, :], q)               # (C, L)
        if params.use_vad:
            last_pow = jnp.sqrt(jnp.maximum(osq * kinv, 0.0))
            mu = jnp.where((last_pow < params.vad_threshold)[None, :],
                           mu, 0.0)

        w = mu * out[None, :]                             # (C, l)
        grad = jnp.einsum("cj,cjk->ck", w, u3, precision=_HP)
        fnew = flt_c + grad
        fnew = jnp.where(jnp.isnan(fnew), 0.0, fnew)
        return (u_t[:, l - K:] if l > K else u_t,
                fnew, out[l - K:] if l > K else out), out

    (blk, flt, lo), outs = jax.lax.scan(
        step, (block, filt, last_out), (u_blocks, das_blocks))
    return outs.reshape(-1), blk, flt, lo
