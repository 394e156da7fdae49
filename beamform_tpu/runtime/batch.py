"""Batched multi-stream execution: the fleet-scale throughput path.

The reference processes exactly one stream per process; production TPU
serving wants many recordings/arrays per chip. Every model here is a pure
function over (chunk, control, carry), so batching is one ``jax.vmap`` over
a stacked batch axis — states included. Combine with
``parallel.sharded`` to spread the batch over a multi-chip mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from beamform_tpu.config import ArrayConfig, EngineConfig
from beamform_tpu.models import get_model


class BatchRunner:
    """Run one model over a batch of streams with batched carried state.

    All streams share the model configuration and geometry (one array
    design, many recordings — the common fleet case); theta may differ per
    stream.
    """

    def __init__(self, model_name: str, engine: EngineConfig,
                 array_cfg: ArrayConfig,
                 params: Optional[Dict[str, Any]] = None,
                 batch: int = 8):
        self.model = get_model(model_name, engine, array_cfg, params)
        self.batch = batch
        self.hop = engine.hop
        self._has_constraints = model_name in ("lcmv", "gss")
        single = self.model.stream_init()
        self.state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), single)
        if model_name == "gsc":
            # vmap over the Pallas kernel would be incorrect (its grid/state
            # logic assumes grid axis 0 is the chunk axis); the model has a
            # natively batched forward instead
            self._vmapped = jax.jit(self.model._forward_batched)
        elif model_name == "lcmv":
            self._vmapped = jax.jit(jax.vmap(
                self.model._forward,
                in_axes=(0, None, None, None, None, 0, 0)))
        elif model_name == "gss":
            self._vmapped = jax.jit(jax.vmap(
                self.model._forward,
                in_axes=(0, None, None, None, None, 0, None, 0)))
        else:
            self._vmapped = jax.jit(jax.vmap(
                self.model._forward, in_axes=(0, None, 0, 0)))

    def process(self, x_batch, theta=0.0):
        """x_batch: (B, M, k*hop) -> (B, k*hop) outputs.

        theta: scalar (shared) or (B,) per-stream constant angles, or
        (B, T) per-stream timelines.
        """
        x = jnp.asarray(x_batch, dtype=self.model.rdtype)
        b = x.shape[0]
        assert b == self.batch, (b, self.batch)
        t = x.shape[-1] // self.hop

        th = np.asarray(theta, dtype=np.float64)
        if th.ndim == 0:
            th = np.full((b, t), float(th))
        elif th.ndim == 1:
            th = np.repeat(th[:, None], t, axis=1)
        uniq, inv = np.unique(th.ravel(), return_inverse=True)
        idx = inv.reshape(b, t).astype(np.int32)
        np_r = self.model.np_r
        u_theta = uniq.astype(np_r)

        if self._has_constraints:
            # static interference set shared across the batch
            k = len(self.model.interf)
            u_ang = np.broadcast_to(
                np.asarray(self.model.interf, dtype=np_r),
                (len(uniq), k)).astype(np_r)
            u_act = np.ones((len(uniq), k), dtype=np_r)
            u_r0 = np.ones((len(uniq),), dtype=np_r)
            if self.model.name == "gss":
                reset_extra = np.zeros((t,), dtype=bool)
                out, self.state = self._vmapped(
                    x, u_theta, u_ang, u_act, u_r0, idx, reset_extra,
                    self.state)
            else:
                out, self.state = self._vmapped(
                    x, u_theta, u_ang, u_act, u_r0, idx, self.state)
        else:
            out, self.state = self._vmapped(x, u_theta, idx, self.state)
        return out
