"""Delay-and-sum beamformer (frequency domain).

Reference: das.cpp — per bin y(f) = w(f)^H x(f) / M (das.cpp:60-63) with
steering weights w_m(f) = exp(-i 2 pi f tau_m), mic0 = 1 (das.cpp:27-45).

TPU design: the whole run is one batched einsum over (frames, mics, bins) —
the per-bin C++ loop becomes a single contraction the compiler fuses with the
FFTs; a theta timeline enters as per-frame steering weights computed
in-graph. Streaming state is just the WOLA boundary carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from beamform_tpu.config import DasParams, EngineConfig
from beamform_tpu.geometry import ArrayGeometry
from beamform_tpu.models import common
from beamform_tpu.models.batching import BatchableModel


def das_spectral(x_spec, weights):
    """y[t, j] = sum_m conj(w[m, j]) x[t, m, j] / M.

    ``x_spec``: (T, M, N); ``weights``: (M, N) or (T, M, N).
    """
    m = x_spec.shape[-2]
    if weights.ndim == 2:
        y = jnp.einsum("mn,tmn->tn", jnp.conj(weights), x_spec)
    else:
        y = jnp.einsum("tmn,tmn->tn", jnp.conj(weights), x_spec)
    return y / m


class DasModel(BatchableModel):
    name = "das"

    def __init__(self, engine: EngineConfig, geom: ArrayGeometry,
                 params: DasParams = DasParams(), interference_angles=()):
        self.engine, self.geom, self.params = engine, geom, params
        self.rdtype, self.cdtype = common.dtypes_of(engine)
        self.np_r = np.float64 if engine.dtype == "float64" else np.float32
        self.freqs = common.make_freqs_ext(engine)
        self.window = common.make_window(engine, self.rdtype)
        self._jit = jax.jit(self._forward)

    def stream_init(self):
        return common.wola_carry_init(self.engine, self.geom.num_mics,
                                      self.rdtype)

    def _forward(self, x, thetas, w_idx, carry: common.WolaCarry):
        w_uniq = common.weights_for_thetas(self.geom, self.freqs, thetas,
                                           self.rdtype, self.cdtype)
        if common.use_wola_kernels(self.engine):
            # the fused WOLA kernel emits (T, M, NB) natively
            spec, tail = common.stft_ext_carry(
                x, self.engine, self.window, self.cdtype, carry.tail)
            m = spec.shape[1]
            w = w_uniq[w_idx]                             # (T, M, NB)
            y = jnp.einsum("tmn,tmn->tn", jnp.conj(w), spec) / m
        else:
            # (M, T, NB) layout straight from the rFFT: contract over mics
            # without transposing the spectra
            spec_mt, tail = common.stft_ext_carry_mt(
                x, self.engine, self.window, self.cdtype, carry.tail)
            m = spec_mt.shape[0]
            w = w_uniq[w_idx]
            y = jnp.einsum("tmn,mtn->tn", jnp.conj(w), spec_mt) / m
        out, prev = common.istft_ext_carry(y, self.engine, self.window,
                                           carry.out_prev)
        return out, common.WolaCarry(tail, prev)

    def _forward_batched(self, x, thetas, idx, carry):
        """Multi-stream forward without vmapping the pallas analysis: the
        (B, M) channels flatten through the WOLA kernels (a vmapped
        pallas_call lowers but serializes poorly), steering applies per
        (stream, frame), and the channel-batched synthesis kernel carries
        one OLA state per stream."""
        if not common.use_wola_kernels(self.engine):
            return jax.vmap(self._forward,
                            in_axes=(0, None, 0, 0))(x, thetas, idx, carry)
        from beamform_tpu.kernels.wola_pallas import (
            istft_ext_fused, stft_planes)
        b, m, s_len = x.shape
        hop = self.engine.hop
        t = s_len // hop
        xf = x.reshape(b * m, s_len)
        tailf = carry.tail.reshape(b * m, hop)
        sr, si, _, tailf2 = stft_planes(xf, tailf, self.window, self.engine,
                                        with_mag=False)
        nb = common.num_bins(self.engine)
        spec = jax.lax.complex(sr[..., :nb], si[..., :nb])  # (T, B*M, NB)
        spec = jnp.moveaxis(spec.reshape(t, b, m, nb), 1, 0)
        w_uniq = common.weights_for_thetas(self.geom, self.freqs, thetas,
                                           self.rdtype, self.cdtype)
        # idx (B,) = one steering per stream (the common serving shape):
        # the (B, 1, M, NB) weights broadcast inside the multiply fusion —
        # a per-(stream, frame) gather would materialize GBs
        w = w_uniq[idx][:, None] if idx.ndim == 1 else w_uniq[idx]
        y = jnp.sum(jnp.conj(w) * spec, axis=2) / m        # (B, T, NB)
        out, prev = istft_ext_fused(y, self.engine, self.window,
                                    carry.out_prev)
        return out, common.WolaCarry(tailf2.reshape(b, m, hop), prev)

    def batched_forward(self, x, ctrl, state):
        """Natively batched override (see _forward_batched). Constant
        per-stream steering (detected host-side) collapses the per-frame
        index to (B,)."""
        import numpy as _np
        uniq, idx = ctrl
        idx_np = _np.asarray(idx)
        if idx_np.ndim == 2 and (idx_np == idx_np[:, :1]).all() \
                and common.use_wola_kernels(self.engine):
            idx = idx_np[:, 0]
            key = "_batched_fn_const"
        else:
            key = "_batched_fn"
        fn = self.__dict__.get(key)
        if fn is None:
            fn = jax.jit(self._forward_batched)
            self.__dict__[key] = fn
        return fn(x, uniq, idx, state)

    def process_chunk(self, x_chunk, theta, state):
        """Streaming step: (M, C*hop) in, ((C*hop,) out, new state)."""
        x = jnp.asarray(x_chunk, dtype=self.rdtype)
        t = x.shape[-1] // self.engine.hop
        uniq, w_idx = self._theta_ctrl(theta, t)
        return self._jit(x, uniq, w_idx, state)

    def process(self, x, theta=0.0):
        """x: (M, S) -> (S',) with S' = S rounded up to a hop multiple."""
        x = common.prepare_input(x, self.engine, self.rdtype)
        out, _ = self.process_chunk(x, theta, self.stream_init())
        return out
