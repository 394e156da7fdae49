"""MVDR beamformer with band/energy-gated frequency subset.

Reference: mvdr.cpp — per bin, sample covariance R from the last
``past_windows`` FFTs with 1.001 multiplicative diagonal loading
(R = (P P^H) .* whiteR, mvdr.cpp:87, 239-243), distortionless weights
w = R^-1 d / (d^H R^-1 d) (mvdr.cpp:88-94), band gate ``freq_min..freq_max``
(else output 0), energy gate ``freq_mag_threshold`` on the mic-mean |X|
(else passthrough 0.01 * X0), ``out_amp`` gain applied to the processed time
window (mvdr.cpp:112-114). The FFT history shifts every frame for in-band
bins regardless of the energy gate (mvdr.cpp:100-101).

TPU design: the per-bin history is a rolling ``(W, M, N_ib)`` tensor carried
through a ``lax.scan`` over frames; covariances are one batched einsum; the
per-bin Eigen ``.inverse()`` becomes a batched complex inverse over the
static in-band bin subset (lane masking replaces data-dependent branching).
Like the reference, singular early-history covariances produce non-finite
weights — parity scenes keep the first W windows below the energy gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from beamform_tpu.config import EngineConfig, MvdrParams
from beamform_tpu.geometry import ArrayGeometry
from beamform_tpu.models import common
from beamform_tpu.models.batching import BatchableModel


def white_r(m: int, rdtype):
    """ones + 0.001 on the diagonal (mvdr.cpp:239-243)."""
    return (jnp.ones((m, m), dtype=rdtype)
            + 0.001 * jnp.eye(m, dtype=rdtype))


#: VMEM headroom for the fused stream kernels' scratch: the pallas_call cap
#: is 24 MB and the frame/constraint input blocks need the rest.
_STREAM_VMEM_BUDGET = 18 * 1024 * 1024


def stream_solver_fits(m: int, nib: int, s_cap: int = 0) -> bool:
    """Whether the fused streaming solver's VMEM scratch fits on-core.

    The kernel holds 8 (M, M, NIBP) f32 scratch planes plus a (M, 1, NIBP)
    vector (mvdr_stream.py scratch_shapes; LCMV adds 2 (S, M, NIBP)
    constraint planes), and the fused analysis path blocks at most
    ``wola_pallas.MAX_CHANNELS_PER_BLOCK`` channels — arrays beyond either
    limit must run the dense path.
    """
    from beamform_tpu.kernels.wola_pallas import MAX_CHANNELS_PER_BLOCK
    if m > MAX_CHANNELS_PER_BLOCK:
        return False
    nibp = -(-max(nib, 1) // 128) * 128
    scratch = (8 * m * m + m + 2 * s_cap * m) * nibp * 4
    return scratch <= _STREAM_VMEM_BUDGET


def select_solver_strategy(solver: str, cdtype, m: int, nib: int,
                           s_cap: int = 0) -> bool:
    """Shared MVDR/LCMV solver-strategy policy: returns True for the fused
    stream kernel, False for the dense block pipeline.

    "auto" picks stream only on a TPU float32 engine whose scratch fits
    (stream_solver_fits); forcing "stream" past the capacity limits raises
    instead of failing deep inside Mosaic. Legacy "sparse" on a float64
    engine used to run the gated-dense path — it maps to dense with a
    deprecation warning rather than breaking pinned configs.
    """
    fits = stream_solver_fits(m, nib, s_cap)
    if solver == "sparse" and cdtype != jnp.complex64:
        import warnings
        warnings.warn(
            "solver='sparse' with float64 is deprecated: the gated-sparse "
            "path was replaced by the float32 stream kernel; running the "
            "dense solver", DeprecationWarning, stacklevel=3)
        return False
    if solver in ("stream", "sparse"):
        if cdtype != jnp.complex64:
            raise ValueError("the stream solver is a float32 strategy; "
                             "use solver='dense' with float64")
        if not fits:
            raise ValueError(
                f"solver='stream' exceeds the fused kernel's on-core "
                f"capacity ({m} mics x {nib} in-band bins; "
                f"channel cap 32, VMEM scratch budget "
                f"{_STREAM_VMEM_BUDGET >> 20} MB) — use solver='dense'")
        return True
    if solver == "dense":
        return False
    from beamform_tpu.models.common import on_tpu_device
    return on_tpu_device() and cdtype == jnp.complex64 and fits


def select_solver_strategy3(solver: str, cdtype, engine, m: int, ib,
                            s_cap: int = 0, w_hist: int = 16) -> str:
    """Tri-state MVDR/LCMV solver policy: "mega" | "stream" | "dense".

    "auto" prefers the mega-fused kernel (kernels/mega_stream.py:
    analysis -> solve -> synthesis in one Pallas program) on a TPU float32
    engine whose band coverage and scratch fit on-core; then the
    three-stage stream kernel; then the dense block pipeline. "mega"
    forces the fused kernel (interpret mode off-TPU — the test hook);
    "stream"/"sparse"/"dense" behave exactly as select_solver_strategy.
    """
    from beamform_tpu.kernels.mega_stream import mega_fits
    from beamform_tpu.models.common import use_wola_kernels
    nfft = engine.fft_win
    nib = len(ib)
    if solver == "mega":
        if cdtype != jnp.complex64:
            raise ValueError("the mega solver is a float32 strategy; "
                             "use solver='dense' with float64")
        if not mega_fits(m, ib, nfft, s_cap, w_hist):
            raise ValueError(
                f"solver='mega' exceeds the fused kernel's on-core "
                f"capacity ({m} mics, band to bin {int(np.max(ib))}, "
                f"nfft {nfft}, past_windows {w_hist}; bands reaching the "
                f"Nyquist bin are also excluded) — use solver='stream' "
                f"or 'dense'")
        return "mega"
    if solver == "auto":
        if (use_wola_kernels(engine)
                and mega_fits(m, ib, nfft, s_cap, w_hist)):
            return "mega"
    return ("stream" if select_solver_strategy(solver, cdtype, m, nib,
                                               s_cap) else "dense")


def batched_inv(a, polish: bool = True, pallas_min_batch: int = 2048):
    """Batched complex matrix inverse (replaces Eigen .inverse()).

    XLA's jnp.linalg.inv lowers through pivoted LU — no complex support on
    TPU and ~100x too slow for tens of thousands of small matrices. The
    MVDR/LCMV matrices are Hermitian positive (semi)definite after the
    1.001 diagonal loading, so an unpivoted vectorized Gauss-Jordan
    (kernels/linalg.py) is safe. One Newton-Schulz step
    X <- X (2I - A X) polishes the float32 result to ~1e-6 relative;
    callers that apply the inverse to a right-hand side should instead pass
    ``polish=False`` and refine at the application site
    (x = X b; x += X (b - A x) — the identical value at M^2 instead of
    2 M^3 cost, since X(2I-AX) b = Xb + X(b - A(Xb))). Singular cold-start
    covariances yield inf/NaN, like the reference's Eigen garbage.
    """
    from beamform_tpu.kernels.linalg import (
        gauss_jordan_inv, gj_inverse_pallas)
    m = a.shape[-1]
    lead = a.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    from beamform_tpu.models.common import on_tpu_device
    if (on_tpu_device() and jnp.issubdtype(a.dtype, jnp.complexfloating)
            and a.dtype == jnp.complex64 and m <= 64
            and b >= pallas_min_batch):
        return gj_inverse_pallas(a.reshape((b, m, m)),
                                 polish=polish).reshape(a.shape)
    inv = gauss_jordan_inv(a)
    if not polish:
        return inv
    eye2 = 2.0 * jnp.eye(m, dtype=a.dtype)
    return inv @ (eye2 - a @ inv)


def mvdr_solve(r, d):
    """w = R^-1 d / (d^H R^-1 d) per bin; r (..., M, M), d (..., M).

    The unpolished Gauss-Jordan inverse is refined on the right-hand side:
    one residual step reproduces the Newton-polished solution exactly.
    """
    hp = jax.lax.Precision.HIGHEST   # default bf16 MXU passes lose the solve
    inv = batched_inv(r, polish=False)
    x0 = jnp.einsum("...mk,...k->...m", inv, d, precision=hp)
    resid = d - jnp.einsum("...mk,...k->...m", r, x0, precision=hp)
    num = x0 + jnp.einsum("...mk,...k->...m", inv, resid, precision=hp)
    den = jnp.einsum("...m,...m->...", jnp.conj(d), num, precision=hp)
    return num / den[..., None]


class MvdrModel(BatchableModel):
    name = "mvdr"

    def __init__(self, engine: EngineConfig, geom: ArrayGeometry,
                 params: MvdrParams = MvdrParams(), interference_angles=()):
        self.engine, self.geom, self.params = engine, geom, params
        self.rdtype, self.cdtype = common.dtypes_of(engine)
        import numpy as _np
        self.np_r = _np.float64 if engine.dtype == "float64" else _np.float32
        self.freqs = common.make_freqs_ext(engine)
        self.window = common.make_window(engine, self.rdtype)
        mask = common.band_mask(self.freqs, params.freq_min, params.freq_max)
        self.ib = np.nonzero(mask)[0].astype(np.int32)   # in-band bin indices
        self._jit = jax.jit(self._forward)

    def stream_init(self):
        return (common.wola_carry_init(self.engine, self.geom.num_mics,
                                       self.rdtype),
                common.device_zeros((self.params.past_windows,
                                     self.geom.num_mics, len(self.ib)),
                                    self.cdtype))

    def _block_frames(self, t: int) -> int:
        """Frames per covariance block: the per-frame solves batch over
        (CB * Nib) matrices so the TPU sees ~15 big launches instead of T
        tiny sequential ones; CB is capped so the outer-product workspace
        (CB+W, Nib, M, M) complex stays ~128 MB."""
        m = self.geom.num_mics
        w = self.params.past_windows
        budget = 128e6 / (len(self.ib) * m * m * 8)
        cb = max(8, min(128, int(budget) - w, t))
        return cb

    def _strategy(self) -> str:
        """Solver strategy: "mega" (one fused Pallas program — the TPU
        float32 production path), "stream" (three-stage fused kernels) or
        "dense" (block-scan pipeline). See select_solver_strategy3."""
        return select_solver_strategy3(self.params.solver, self.cdtype,
                                       self.engine, self.geom.num_mics,
                                       self.ib,
                                       w_hist=self.params.past_windows)

    def _use_stream(self) -> bool:
        """Whether a fused stream kernel (mega or three-stage) carries the
        solve — the sharded execution path keys off this to shard the
        stream kernel over bin groups (parallel/sharded.py)."""
        return self._strategy() in ("mega", "stream")

    def _forward_mega(self, x, thetas, w_idx, state):
        """Mega-fused path (kernels/mega_stream.py): WOLA analysis, the
        sliding-covariance MVDR solve and the synthesis all run in ONE
        Pallas kernel marching the frame axis — raw audio in, beamformed
        audio out, spectra never leave VMEM. Refinement is off (measured
        on-chip: unrefined deviates 8.5e-5/3.8e-4 from the f64 oracle on
        white/speech input vs 8.9e-5/3.6e-4 refined)."""
        p = self.params
        carry, hist0 = state
        w_uniq = common.weights_for_thetas(self.geom, self.freqs, thetas,
                                           self.rdtype, self.cdtype)
        d_ib = w_uniq[:, :, jnp.asarray(self.ib)]
        # LOAD-BEARING: same staging barrier as LcmvModel._forward_mega /
        # GssModel — XLA fusing the on-device steering build into the
        # custom call's operand staging intermittently faults the axon
        # worker at program LOAD (hang + >15 min unreachable chip). MVDR
        # first hit it in round 5 when the kernel grew lane-grouped solves
        # (2026-08-19, sweep run FB=8/SEG=192: client hung at load, a
        # trivial matmul probe from a fresh process hung too). Do not
        # remove without re-running tools/axon_fault_repro.py
        # (docs/ROADMAP.md item 2).
        d_ib = jax.lax.optimization_barrier(d_ib)
        from beamform_tpu.kernels.mega_stream import mvdr_mega
        audio, hist, prev = mvdr_mega(
            x, carry.tail, carry.out_prev, hist0, d_ib,
            jnp.asarray(w_idx), self.ib, self.engine.fft_win,
            p.past_windows, p.freq_mag_threshold,
            interpret=not common.on_tpu_device())
        # sub-hop chunk: the kernel's early return marched nothing, so the
        # carried tail must stay intact (an undersized x[:, -hop:] would
        # corrupt the WolaCarry shape for the next chunk)
        tail = (carry.tail if x.shape[1] < self.engine.hop
                else x[:, -self.engine.hop:])
        return audio * p.out_amp, (common.WolaCarry(tail, prev), hist)

    def _forward_stream(self, x, thetas, w_idx, state):
        """Fused-kernel path: the per-frame sliding covariance, Cholesky
        solve and beamform application all run inside one Pallas kernel
        marching the frame axis, with silent frames (no gate-passing bin)
        skipping the solve entirely — the reference's own gate sparsity
        (mvdr.cpp:84-96) at frame granularity. On TPU the analysis side is
        the fused WOLA kernel feeding f32 planes straight through (no
        complex spectra ever materialize); off-TPU (the test hook) the
        plain complex path runs in interpret mode. Output and carried state
        match the dense path to f32 round-off."""
        p = self.params
        n = self.engine.fft_win
        w_hist = p.past_windows
        carry, hist0 = state
        w_uniq = common.weights_for_thetas(self.geom, self.freqs, thetas,
                                           self.rdtype, self.cdtype)
        ib = jnp.asarray(self.ib)
        contig = bool(np.all(np.diff(self.ib) == 1))
        w_idx = jnp.asarray(w_idx)

        if common.use_wola_kernels(self.engine):
            from beamform_tpu.kernels.wola_pallas import stft_planes
            from beamform_tpu.kernels.mvdr_stream import (
                mvdr_stream_planes_pallas)
            sr, si, mag, tail = stft_planes(x, carry.tail, self.window,
                                            self.engine)
            t = sr.shape[0]
            if contig:
                i0, i1 = int(self.ib[0]), int(self.ib[-1]) + 1
                xr_ib, xi_ib = sr[:, :, i0:i1], si[:, :, i0:i1]
                mag_ib = mag[:, i0:i1]
            else:
                xr_ib, xi_ib = sr[:, :, ib], si[:, :, ib]
                mag_ib = mag[:, ib]
            d_ib = w_uniq[:, :, ib]
            gate = mag_ib > p.freq_mag_threshold
            act = jnp.any(gate, axis=1)
            xr_ext = jnp.concatenate([hist0.real, xr_ib], axis=0)
            xi_ext = jnp.concatenate([hist0.imag, xi_ib], axis=0)
            yr, yi = mvdr_stream_planes_pallas(
                xr_ext, xi_ext, d_ib.real, d_ib.imag, w_idx, act,
                w_hist=w_hist)
            y_k = jax.lax.complex(yr, yi)
            x0_ib = jax.lax.complex(xr_ib[:, 0, :], xi_ib[:, 0, :])
            y_ib = jnp.where(gate, y_k, x0_ib * 0.01)      # mvdr.cpp:96
            hist = jax.lax.complex(xr_ext[t:t + w_hist],
                                   xi_ext[t:t + w_hist])
            x00 = jax.lax.complex(sr[:, 0, 0], si[:, 0, 0])
            nb = common.num_bins(self.engine)
            if contig:
                # contiguous band: build y by concatenation (a scatter
                # would re-materialize the whole (T, NB) plane)
                zl = jnp.zeros((t, i0 - 1), dtype=self.cdtype)
                zr = jnp.zeros((t, nb - i1), dtype=self.cdtype)
                y = jnp.concatenate([x00[:, None], zl, y_ib, zr], axis=1)
            else:
                y = jnp.zeros((t, nb), dtype=self.cdtype)
                y = y.at[:, ib].set(y_ib)
                y = y.at[:, 0].set(x00)                       # mvdr.cpp:76
            out, prev = common.istft_ext_carry(y, self.engine, self.window,
                                               carry.out_prev)
            return out * p.out_amp, (common.WolaCarry(tail, prev), hist)

        from beamform_tpu.kernels.mvdr_stream import mvdr_stream_pallas
        x_spec, tail = common.stft_ext_carry(x, self.engine, self.window,
                                             self.cdtype, carry.tail)
        mag = common.mag_mean_over_mics(x_spec, n)
        x_ib = x_spec[:, :, ib]                            # (T, M, Nib)
        mag_ib = mag[:, ib]
        d_ib = w_uniq[:, :, ib]                            # (U, M, Nib)
        t = x_ib.shape[0]

        gate = mag_ib > p.freq_mag_threshold               # (T, Nib)
        act = jnp.any(gate, axis=1)
        x_ext = jnp.concatenate([hist0, x_ib], axis=0)     # (W+T, M, Nib)
        y_k = mvdr_stream_pallas(x_ext, d_ib, w_idx, act, w_hist=w_hist,
                                 interpret=not common.on_tpu_device())
        y_ib = jnp.where(gate, y_k, x_ib[:, 0, :] * 0.01)  # mvdr.cpp:96
        hist = x_ext[t:t + w_hist]

        y = jnp.zeros((x_spec.shape[0], x_spec.shape[2]),
                      dtype=self.cdtype)                      # (T, NB)
        y = y.at[:, ib].set(y_ib)
        y = y.at[:, 0].set(x_spec[:, 0, 0])                   # mvdr.cpp:76
        out, prev = common.istft_ext_carry(y, self.engine, self.window,
                                           carry.out_prev)
        return out * p.out_amp, (common.WolaCarry(tail, prev), hist)

    def _forward(self, x, thetas, w_idx, state):
        strategy = self._strategy()
        if strategy == "mega":
            return self._forward_mega(x, thetas, w_idx, state)
        if strategy == "stream":
            return self._forward_stream(x, thetas, w_idx, state)
        p = self.params
        m = self.geom.num_mics
        n = self.engine.fft_win
        w_hist = p.past_windows
        carry, hist0 = state
        x_spec, tail = common.stft_ext_carry(x, self.engine, self.window,
                                             self.cdtype, carry.tail)
        w_uniq = common.weights_for_thetas(self.geom, self.freqs, thetas,
                                           self.rdtype, self.cdtype)
        mag = common.mag_mean_over_mics(x_spec, n)         # (T, NB)
        ib = jnp.asarray(self.ib)
        x_ib = x_spec[:, :, ib]                            # (T, M, Nib)
        mag_ib = mag[:, ib]
        d_ib = w_uniq[:, :, ib]                            # (U, M, Nib)
        wr = white_r(m, self.rdtype).astype(self.cdtype)

        t = x_ib.shape[0]
        cb = self._block_frames(t)
        tpad = -(-t // cb) * cb
        x_blk = jnp.pad(x_ib, ((0, tpad - t), (0, 0), (0, 0)))
        mag_blk = jnp.pad(mag_ib, ((0, tpad - t), (0, 0)))
        u_blk = jnp.pad(w_idx, (0, tpad - t))
        x_blk = x_blk.reshape(tpad // cb, cb, m, -1)
        mag_blk = mag_blk.reshape(tpad // cb, cb, -1)
        u_blk = u_blk.reshape(tpad // cb, cb)

        # sliding-window selector: G[t] = sum of the W frames BEFORE frame t
        # (the reference updates history after solving, mvdr.cpp:87,100-101)
        # — as a banded 0/1 matmul over the frame axis (one MXU pass beats a
        # cumsum's many HBM sweeps over the outer-product tensor)
        band = (jnp.tri(cb, cb + w_hist, w_hist - 1, dtype=self.rdtype)
                - jnp.tri(cb, cb + w_hist, -1, dtype=self.rdtype))

        from beamform_tpu.models.common import on_tpu_device
        native = (on_tpu_device() and self.cdtype == jnp.complex64
                  and m <= 64)

        def block_step(hist, inp):
            xb, magb, ub = inp                    # (CB, M, Nib), (CB, Nib)
            ext = jnp.concatenate([hist, xb], axis=0)      # (W+CB, M, Nib)
            if native:
                # batch-on-lanes layout end to end: the outer products and
                # the banded sum emit (M, K, CB, Nib) directly, feeding the
                # Pallas Gauss-Jordan kernel with no big transposes
                from beamform_tpu.kernels.linalg import gj_inverse_pallas_native
                o = jnp.einsum("tmn,tkn->mktn", ext, jnp.conj(ext))
                g = jnp.einsum("ct,mktn->mkcn", band.astype(o.dtype), o,
                               precision=jax.lax.Precision.HIGHEST)
                r = g * wr[:, :, None, None]
                nib = r.shape[-1]
                rb = r.reshape(m, m, cb * nib)             # (M, K, B)
                inv = gj_inverse_pallas_native(rb, polish=False)
                d = jnp.moveaxis(d_ib[ub], 1, -1).reshape(cb * nib, m)
                # refinement on the RHS == in-kernel Newton polish, at M^2;
                # HIGHEST so the MXU's default bf16 passes don't undo it
                hp = jax.lax.Precision.HIGHEST
                x0 = jnp.einsum("mkb,bk->bm", inv, d, precision=hp)
                resid = d - jnp.einsum("mkb,bk->bm", rb, x0, precision=hp)
                num = x0 + jnp.einsum("mkb,bk->bm", inv, resid, precision=hp)
                den = jnp.einsum("bm,bm->b", jnp.conj(d), num, precision=hp)
                w_opt = num / den[:, None]
                xt = jnp.moveaxis(xb, 1, -1).reshape(cb * nib, m)
                y_bf = jnp.einsum("bm,bm->b", jnp.conj(w_opt), xt,
                                  precision=hp).reshape(cb, nib)
            else:
                o = jnp.einsum("tmn,tkn->tnmk", ext, jnp.conj(ext))
                g = jnp.einsum("ct,tnmk->cnmk", band.astype(o.dtype), o,
                               precision=jax.lax.Precision.HIGHEST)
                r = g * wr[None, None, :, :]               # (CB, Nib, M, M)
                d = jnp.moveaxis(d_ib[ub], 1, -1)          # (CB, Nib, M)
                w_opt = mvdr_solve(r, d)
                y_bf = jnp.einsum("tnm,tmn->tn", jnp.conj(w_opt), xb,
                                  precision=jax.lax.Precision.HIGHEST)
            y_t = jnp.where(magb > p.freq_mag_threshold, y_bf,
                            xb[:, 0, :] * 0.01)
            return ext[cb:], y_t

        hist, y_blk = jax.lax.scan(block_step, hist0,
                                   (x_blk, mag_blk, u_blk))
        y_ib = y_blk.reshape(tpad, -1)[:t]
        # state continuity: the history is simply the last W frames seen
        hist = jnp.concatenate([hist0, x_ib], axis=0)[t:t + w_hist]

        y = jnp.zeros((x_spec.shape[0], x_spec.shape[2]),
                      dtype=self.cdtype)                      # (T, NB)
        y = y.at[:, ib].set(y_ib)
        y = y.at[:, 0].set(x_spec[:, 0, 0])                   # mvdr.cpp:76
        out, prev = common.istft_ext_carry(y, self.engine, self.window,
                                           carry.out_prev)
        return out * p.out_amp, (common.WolaCarry(tail, prev), hist)

    def process_chunk(self, x_chunk, theta, state):
        x = jnp.asarray(x_chunk, dtype=self.rdtype)
        t = x.shape[-1] // self.engine.hop
        uniq, w_idx = self._theta_ctrl(theta, t)
        return self._jit(x, uniq, w_idx, state)

    def process(self, x, theta=0.0):
        x = common.prepare_input(x, self.engine, self.rdtype)
        out, _ = self.process_chunk(x, theta, self.stream_init())
        return out
