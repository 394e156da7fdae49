"""Shared building blocks for the beamformer models.

The reference's per-node ``apply_weights`` C++ loops become batched tensor
ops over ``(frames, mics, bins)`` here. Everything is a pure function of
``(static config, per-frame inputs)`` — no globals, no locks (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from beamform_tpu.config import EngineConfig
from beamform_tpu.dsp.wola import analyze, sqrt_hann, synthesize, pad_to_hop
from beamform_tpu.geometry import (
    ArrayGeometry,
    frequency_vector,
    steering_delays,
    steering_weights,
)


def dtypes_of(engine: EngineConfig):
    if engine.dtype == "float64":
        return jnp.float64, jnp.complex128
    return jnp.float32, jnp.complex64


def stft(x, engine: EngineConfig, window, cdtype):
    """(M, S) -> (T, M, nfft) complex spectra of windowed frames."""
    spec = analyze(x, engine.hop, window, cdtype=cdtype)  # (M, T, N)
    return jnp.moveaxis(spec, 0, 1)


def istft(y_spec, engine: EngineConfig, window):
    """(T, nfft) complex -> (T*hop,) real output stream."""
    return synthesize(y_spec, engine.hop, window)


def band_mask(freqs: np.ndarray, fmin: float, fmax: float) -> np.ndarray:
    """Static in-band bin mask: fmin <= |f| <= fmax over the (quirky)
    full-length frequency vector (mvdr.cpp:84,109). Bin 0 is handled
    separately by every node (y[0] = X0[0]) and is excluded here."""
    m = (np.abs(freqs) >= fmin) & (np.abs(freqs) <= fmax)
    m[0] = False
    return m


def mag_mean_over_mics(x_spec):
    """(..., M, N) -> (..., N): mean |X| over mics / nfft, the energy-gate
    statistic (mvdr.cpp:79-82: sum |X_i| / (M * fft_win))."""
    m = x_spec.shape[-2]
    n = x_spec.shape[-1]
    return jnp.sum(jnp.abs(x_spec), axis=-2) / (m * n)


def frame_weights(geom: ArrayGeometry, freqs, theta_frames, rdtype,
                  row0_scale=1.0):
    """Steering weights per frame: theta (T,) -> (T, M, nfft) complex.

    vmapped over the theta timeline; replaces the reference's
    ``theta_roscallback -> update_weights`` mutation (das.cpp:94-99).
    """
    tau = steering_delays(geom, theta_frames, dtype=rdtype)  # (T, M)
    return steering_weights(jnp.asarray(freqs, dtype=rdtype), tau,
                            row0_scale=row0_scale)


def unique_theta_weights(geom, freqs, theta_frames, rdtype, row0_scale=1.0):
    """Memory-saving path: weights for the unique thetas only, plus an index
    per frame. Host-side; theta timelines are concrete control inputs."""
    th = np.atleast_1d(np.asarray(theta_frames, dtype=np.float64))
    uniq, inv = np.unique(th, return_inverse=True)
    w = frame_weights(geom, freqs, jnp.asarray(uniq), rdtype,
                      row0_scale=row0_scale)  # (U, M, N)
    return w, jnp.asarray(inv, dtype=jnp.int32)


def prepare_input(x, engine: EngineConfig, rdtype):
    """Pad (M, S) to a hop multiple and cast to the compute dtype."""
    x = jnp.asarray(x, dtype=rdtype)
    if x.ndim == 1:
        x = x[None, :]
    return pad_to_hop(x, engine.hop)


def theta_per_frame(theta, num_frames: int) -> np.ndarray:
    """Normalise a theta control input to a per-frame (T,) float array.

    Accepts a scalar (constant steering) or an array of per-frame angles —
    the timeline replacement for the ``/theta`` ROS topic (SURVEY.md §1 L4).
    """
    th = np.asarray(theta, dtype=np.float64)
    if th.ndim == 0:
        return np.full((num_frames,), float(th))
    if th.ndim != 1 or len(th) > num_frames or len(th) == 0:
        raise ValueError(
            f"theta timeline shape {th.shape} incompatible with "
            f"{num_frames} frames")
    if len(th) < num_frames:
        # input padding to a hop multiple can add a trailing frame; the last
        # angle holds (ROS 'latest message wins' semantics).
        th = np.concatenate([th, np.full(num_frames - len(th), th[-1])])
    return th


def make_window(engine: EngineConfig, rdtype):
    return jnp.asarray(sqrt_hann(engine.fft_win), dtype=rdtype)


def make_freqs(engine: EngineConfig) -> np.ndarray:
    return frequency_vector(engine.fft_win, engine.sample_rate,
                            exact=engine.exact_freqs)


def polar_mag_phase(z):
    """(|z|, atan2 phase) — the reference's mag/phase reconstruction
    (e.g. phase.cpp:115: mag*cos(pha) + i*mag*sin(pha))."""
    return jnp.abs(z), jnp.arctan2(z.imag, z.real)


def from_mag_phase(mag, pha):
    return jax.lax.complex(mag * jnp.cos(pha), mag * jnp.sin(pha))
