"""Streaming engine: chunked online processing with explicit state.

The reference streams via JACK's real-time callback with all filter state in
process-lifetime globals, lost on exit (SURVEY.md §5: no checkpoint/resume).
Here every model's streaming state is an explicit pytree (WOLA boundary
carries + the model's adaptive state), so:

* online chunked execution is sample-identical to one offline batch call
  (the batch path IS a single chunk with a zero carry);
* a session can be checkpointed to disk mid-stream and resumed elsewhere;
* chunk size is a fixed shape => one compiled program reused every chunk,
  giving O(1) memory for unbounded audio (the lax.scan-over-chunks story of
  SURVEY.md §5 long-context).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from beamform_tpu.config import ArrayConfig, EngineConfig
from beamform_tpu.models import get_model


class StreamingSession:
    """Stateful wrapper around a model's (stream_init, process_chunk)."""

    def __init__(self, model, chunk_frames: Optional[int] = None,
                 monitor=None):
        self.model = model
        self.hop = model.engine.hop
        self.chunk_frames = chunk_frames
        self.state = model.stream_init()
        self.frames_done = 0
        if monitor is True:
            from beamform_tpu.utils.profiling import RealTimeMonitor
            monitor = RealTimeMonitor(model.engine.sample_rate)
        self.monitor = monitor

    def process(self, x_chunk, theta=None, interference=None):
        """Feed (M, k*hop) samples; returns (k*hop,) output samples.

        ``theta``: scalar or per-frame (k,) timeline for this chunk; default
        holds the previous steering (matching ROS latest-message-wins).
        ``interference``: optional InterferenceTimeline rows for this chunk
        (lcmv/gss only).
        """
        x = np.asarray(x_chunk)
        if x.ndim == 1:
            x = x[None, :]
        assert x.shape[-1] % self.hop == 0, (
            f"chunk length {x.shape[-1]} must be a multiple of hop "
            f"{self.hop}")
        if self.chunk_frames is not None:
            assert x.shape[-1] == self.chunk_frames * self.hop
        if theta is None:
            theta = getattr(self, "_last_theta", 0.0)
        if self.monitor is not None:
            self.monitor.start_chunk()
        if interference is not None:
            out, self.state = self.model.process_chunk(
                x, theta, self.state, interference=interference)
        else:
            out, self.state = self.model.process_chunk(x, theta, self.state)
        if self.monitor is not None:
            import jax
            jax.block_until_ready(out)
            self.monitor.end_chunk(x.shape[-1])
        th = np.atleast_1d(np.asarray(theta, dtype=np.float64))
        self._last_theta = float(th[-1])
        self.frames_done += x.shape[-1] // self.hop
        return out

    # -- checkpoint / resume ------------------------------------------------

    def save(self, path: str):
        """Checkpoint the full streaming state to an .npz file."""
        leaves, treedef = jax.tree.flatten(self.state)
        arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
        arrays["__frames_done__"] = np.asarray(self.frames_done)
        arrays["__last_theta__"] = np.asarray(
            getattr(self, "_last_theta", 0.0))
        np.savez(path, **arrays)

    def load(self, path: str):
        """Restore a checkpoint created by :meth:`save`."""
        data = np.load(path)
        leaves, treedef = jax.tree.flatten(self.state)
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        restored = jax.tree.unflatten(treedef, new_leaves)
        self.state = jax.tree.map(
            lambda ref, v: jax.numpy.asarray(v, dtype=ref.dtype),
            self.state, restored)
        self.frames_done = int(data["__frames_done__"])
        self._last_theta = float(data["__last_theta__"])


def open_session(model_name: str, engine: EngineConfig,
                 array_cfg: ArrayConfig, params=None,
                 chunk_frames: Optional[int] = None) -> StreamingSession:
    model = get_model(model_name, engine, array_cfg, params)
    return StreamingSession(model, chunk_frames)
