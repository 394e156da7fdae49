"""Offline evaluation harness: scenes, alignment, separation metrics.

The reference's verification story (SURVEY.md §4) is experimental: record the
beamformer output as WAV, replay mic1 through ``rosjack_ref`` for
sample-aligned comparison, compute SIR offline. This module is that story as
a library: synthesize controlled multichannel scenes (far-field point sources
with true geometric delays + noise), run any beamformer, align with the
``ref`` path, and report SNR/SIR improvements.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from beamform_tpu.geometry import ArrayGeometry, steering_delays_np


@dataclass
class Scene:
    """A synthesized far-field scene with per-source ground truth."""

    mixture: np.ndarray          # (M, S) mic signals
    images: np.ndarray           # (num_sources, M, S) per-source mic images
    noise: np.ndarray            # (M, S)
    angles: Sequence[float]      # source DOAs (deg)
    sample_rate: int


def synth_scene(geom: ArrayGeometry, sources, angles, sample_rate: int,
                noise_std: float = 0.0, seed: int = 0) -> Scene:
    """Far-field mixture: each source arrives at mic m with its geometric
    delay tau_m(angle) (linear interpolation for fractional delays).

    sources: list of (S,) arrays (same length).
    """
    rng = np.random.default_rng(seed)
    m = geom.num_mics
    s = len(sources[0])
    images = np.zeros((len(sources), m, s))
    t = np.arange(s)
    for si, (src, ang) in enumerate(zip(sources, angles)):
        tau = steering_delays_np(geom, float(ang))
        for mi in range(m):
            d = tau[mi] * sample_rate
            i0 = int(np.floor(d))
            frac = d - i0
            idx0 = np.clip(t + i0, 0, s - 1)
            idx1 = np.clip(t + i0 + 1, 0, s - 1)
            images[si, mi] = (1 - frac) * src[idx0] + frac * src[idx1]
    noise = noise_std * rng.standard_normal((m, s))
    return Scene(mixture=images.sum(axis=0) + noise, images=images,
                 noise=noise, angles=list(angles), sample_rate=sample_rate)


def align_to_ref(y: np.ndarray, hop: int) -> np.ndarray:
    """Undo the one-window WOLA latency: output sample s corresponds to
    input sample s - hop (util.h:276-278; the rosjack_ref alignment)."""
    return y[hop:]


def si_sdr(estimate: np.ndarray, target: np.ndarray) -> float:
    """Scale-invariant SDR (dB) of ``estimate`` against ``target``."""
    n = min(len(estimate), len(target))
    e, t = estimate[:n].astype(np.float64), target[:n].astype(np.float64)
    t = t - t.mean()
    e = e - e.mean()
    alpha = np.dot(e, t) / (np.dot(t, t) + 1e-12)
    s = alpha * t
    err = e - s
    return 10.0 * np.log10((np.dot(s, s) + 1e-12)
                           / (np.dot(err, err) + 1e-12))


def sir_db(estimate: np.ndarray, target_img: np.ndarray,
           interf_img: np.ndarray) -> float:
    """Signal-to-interference ratio by least-squares decomposition of the
    estimate onto the (mic0) target and interference images."""
    n = min(len(estimate), target_img.shape[-1], interf_img.shape[-1])
    e = estimate[:n].astype(np.float64)
    basis = np.stack([target_img[:n], interf_img[:n]]).astype(np.float64)
    coef, *_ = np.linalg.lstsq(basis.T, e, rcond=None)
    sig = coef[0] * basis[0]
    intf = coef[1] * basis[1]
    return 10.0 * np.log10((np.dot(sig, sig) + 1e-12)
                           / (np.dot(intf, intf) + 1e-12))


def evaluate_separation(model, scene: Scene, theta: float,
                        target_index: int = 0,
                        interf_index: Optional[int] = None) -> dict:
    """Run a beamformer on a scene and report input/output SIR (dB).

    Input SIR is measured at mic0 of the mixture; output SIR on the
    latency-aligned beamformer output.
    """
    hop = model.engine.hop
    y = np.asarray(model.process(scene.mixture, theta))
    y = align_to_ref(y, hop)
    tgt = scene.images[target_index, 0]
    if interf_index is None:
        interf_index = 1 if len(scene.images) > 1 else 0
    itf = scene.images[interf_index, 0]
    sir_in = sir_db(scene.mixture[0], tgt, itf)
    sir_out = sir_db(y, tgt[:len(y)], itf[:len(y)])
    return {
        "sir_in_db": round(float(sir_in), 2),
        "sir_out_db": round(float(sir_out), 2),
        "sir_gain_db": round(float(sir_out - sir_in), 2),
        "si_sdr_db": round(float(si_sdr(y, tgt[:len(y)])), 2),
    }
