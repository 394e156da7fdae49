"""Per-callback WOLA driver mimicking util.h:257-314 (do_overlap) exactly."""

from __future__ import annotations

import numpy as np


def hann_periodic(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)


def sqrt_hann(n: int) -> np.ndarray:
    return np.sqrt(hann_periodic(n))


class OracleWola:
    """Simulates the shared-output overlap-add path (prepare_overlap_and_add +
    do_overlap, util.h:257-314): per-mic ring buffers pre-filled with one hop
    of zeros, double-buffered output windows."""

    def __init__(self, hop: int, num_mics: int):
        self.hop = hop
        self.nfft = 2 * hop
        self.m = num_mics
        self.win = sqrt_hann(self.nfft)
        self.ring = np.zeros((num_mics, hop), dtype=np.float64)
        self.out_prev = np.zeros(self.nfft, dtype=np.float64)

    def step(self, new_samples: np.ndarray, apply_weights) -> np.ndarray:
        """One JACK callback: ``new_samples`` (M, hop) in, (hop,) out.

        ``apply_weights(xw)`` receives the windowed time window (M, nfft) and
        must return the *processed time window* p (nfft,) — i.e. the result
        of the node's FFT -> per-bin math -> normalised iFFT -> synthesis
        window chain (overlap_and_add_prepare_output, util.h:244-253).
        """
        window = np.concatenate([self.ring, new_samples], axis=1)
        xw = window * self.win[None, :]
        p = apply_weights(xw)
        out = self.out_prev[self.hop:] + p[:self.hop]
        self.out_prev = p
        self.ring = new_samples.copy()
        return out


class OracleWolaByMic:
    """Per-mic overlap-add (prepare_overlap_and_add_bymic + do_overlap_bymic,
    util.h:318-379), used by GSC and rosjack_ref."""

    def __init__(self, hop: int, num_mics: int):
        self.hop = hop
        self.nfft = 2 * hop
        self.m = num_mics
        self.win = sqrt_hann(self.nfft)
        self.ring = np.zeros((num_mics, hop), dtype=np.float64)
        self.out_prev = np.zeros((num_mics, self.nfft), dtype=np.float64)

    def step(self, new_samples: np.ndarray, apply_weights) -> np.ndarray:
        """One callback: (M, hop) in -> per-mic aligned outputs (M, hop).

        ``apply_weights(xw_i, mic)`` gets one windowed time window (nfft,)
        and returns that mic's processed time window (nfft,).
        """
        out = np.zeros((self.m, self.hop), dtype=np.float64)
        for i in range(self.m):
            window = np.concatenate([self.ring[i], new_samples[i]])
            p = apply_weights(window * self.win, i)
            out[i] = self.out_prev[i, self.hop:] + p[:self.hop]
            self.out_prev[i] = p
        self.ring = new_samples.copy()
        return out


def run_oracle(node, x: np.ndarray, hop: int) -> np.ndarray:
    """Drive an oracle node over a multichannel signal.

    ``x``: (M, S) float64 with S a multiple of ``hop``; returns (S,) —
    one hop of output per callback, like the reference's JACK output port.
    ``node`` must expose ``callback(new_samples (M, hop)) -> (hop,)``.
    """
    m, s = x.shape
    assert s % hop == 0
    outs = []
    for t in range(s // hop):
        outs.append(node.callback(x[:, t * hop:(t + 1) * hop]))
    return np.concatenate(outs)
