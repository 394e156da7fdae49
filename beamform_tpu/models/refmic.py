"""Utility nodes: the alignment reference and the loudest-mic reader.

* RefModel — jack_ref.cpp:19-30: mic0 through the identity WOLA path
  (windowed twice, overlap-added) so its output time-aligns sample-exactly
  with every beamformer's output; the cornerstone of offline evaluation
  (README.md:42).
* ReadModel — jack_read.cpp:10-43: per window, pass through the loudest
  microphone (energy = sum |100*x|), keeping the previous pick for all-zero
  windows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beamform_tpu.config import DasParams, EngineConfig
from beamform_tpu.geometry import ArrayGeometry
from beamform_tpu.models import common
from beamform_tpu.models.batching import BatchableModel
from beamform_tpu.dsp.wola import frame_signal_carry, overlap_add_carry


class RefModel(BatchableModel):
    name = "ref"

    def __init__(self, engine: EngineConfig, geom: ArrayGeometry,
                 params: DasParams = DasParams(), interference_angles=()):
        self.engine = engine
        self.rdtype, _ = common.dtypes_of(engine)
        import numpy as _np
        self.np_r = _np.float64 if engine.dtype == "float64" else _np.float32
        self.window = common.make_window(engine, self.rdtype)
        self._jit = jax.jit(self._forward)

    def stream_init(self):
        h = self.engine.hop
        return common.WolaCarry(common.device_zeros((h,), self.rdtype),
                                common.device_zeros((h,), self.rdtype))

    def _forward(self, x, thetas, w_idx, carry: common.WolaCarry):
        del thetas, w_idx  # no steering (jack_ref.cpp)
        frames, tail = frame_signal_carry(x[0], self.engine.hop, carry.tail)
        p = frames * self.window * self.window           # hann^2, no FFT
        out, prev = overlap_add_carry(p, self.engine.hop, carry.out_prev)
        return out, common.WolaCarry(tail, prev)

    def process_chunk(self, x_chunk, theta, state):
        x = jnp.asarray(x_chunk, dtype=self.rdtype)
        if x.ndim == 1:
            x = x[None, :]
        t = x.shape[-1] // self.engine.hop
        uniq, w_idx = self._theta_ctrl(0.0, t)
        return self._jit(x, uniq, w_idx, state)

    def process(self, x, theta=0.0):
        x = common.prepare_input(x, self.engine, self.rdtype)
        out, _ = self.process_chunk(x, theta, self.stream_init())
        return out


class ReadModel(BatchableModel):
    name = "read"

    def __init__(self, engine: EngineConfig, geom: ArrayGeometry,
                 params: DasParams = DasParams(), interference_angles=()):
        self.engine = engine
        self.rdtype, _ = common.dtypes_of(engine)
        import numpy as _np
        self.np_r = _np.float64 if engine.dtype == "float64" else _np.float32
        self._jit = jax.jit(self._forward)

    def stream_init(self):
        return jnp.int32(-1)    # max_mic_past (jack_read.cpp:8)

    def _forward(self, x, thetas, w_idx, past):
        del thetas, w_idx  # no steering (jack_read.cpp)
        h = self.engine.hop
        m, s = x.shape
        wins = x.reshape(m, s // h, h)
        energy = jnp.sum(jnp.abs(wins * 100.0), axis=-1).T   # (T, M)

        def step(past, e_t):
            # jack_read.cpp:20-37: strictly-greater scan keeps the first
            # max; all-zero windows keep the previous pick (or mic0 at t=0).
            any_pos = jnp.any(e_t > 0.0)
            pick = jnp.argmax(e_t).astype(jnp.int32)
            first = past < 0
            idx = jnp.where(any_pos, pick,
                            jnp.where(first, jnp.int32(0), past))
            return idx, idx

        past, picks = jax.lax.scan(step, past, energy)
        sel = jnp.take_along_axis(
            jnp.moveaxis(wins, 0, 1), picks[:, None, None], axis=1)
        return sel[:, 0, :].reshape(-1), past

    def process_chunk(self, x_chunk, theta, state):
        x = jnp.asarray(x_chunk, dtype=self.rdtype)
        t = x.shape[-1] // self.engine.hop
        uniq, w_idx = self._theta_ctrl(0.0, t)
        return self._jit(x, uniq, w_idx, state)

    def process(self, x, theta=0.0):
        x = common.prepare_input(x, self.engine, self.rdtype)
        out, _ = self.process_chunk(x, theta, self.stream_init())
        return out
