"""Delay-and-sum beamformer (frequency domain).

Reference: das.cpp — per bin y(f) = w(f)^H x(f) / M (das.cpp:60-63) with
steering weights w_m(f) = exp(-i 2 pi f tau_m), mic0 = 1 (das.cpp:27-45).

TPU design: the whole run is one batched einsum over (frames, mics, bins) —
the per-bin C++ loop becomes a single contraction the compiler fuses with the
FFTs; a theta timeline enters as per-frame steering weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beamform_tpu.config import DasParams, EngineConfig
from beamform_tpu.geometry import ArrayGeometry
from beamform_tpu.models import common


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


class DasModel:
    name = "das"

    def __init__(self, engine: EngineConfig, geom: ArrayGeometry,
                 params: DasParams = DasParams(), interference_angles=()):
        self.engine, self.geom, self.params = engine, geom, params
        self.rdtype, self.cdtype = common.dtypes_of(engine)
        self.freqs = common.make_freqs(engine)
        self.window = common.make_window(engine, self.rdtype)
        self._jit = jax.jit(self._forward)

    def _forward(self, x, w_uniq, w_idx):
        x_spec = common.stft(x, self.engine, self.window, self.cdtype)
        w = w_uniq[w_idx]  # (T, M, N)
        y = das_spectral(x_spec, w)
        return common.istft(y, self.engine, self.window)

    def process(self, x, theta=0.0):
        """x: (M, S) -> (S',) with S' = S rounded up to a hop multiple."""
        x = common.prepare_input(x, self.engine, self.rdtype)
        t = x.shape[-1] // self.engine.hop
        th = common.theta_per_frame(theta, t)
        w_uniq, w_idx = common.unique_theta_weights(
            self.geom, self.freqs, th, self.rdtype)
        return self._jit(x, w_uniq.astype(self.cdtype), w_idx)
