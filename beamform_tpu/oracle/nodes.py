"""Faithful float64 NumPy ports of each reference node's DSP.

Written as direct transliterations of the C++ (per-bin loops, persistent
buffers, quirks preserved) for use as parity oracles. File:line citations
point into /root/reference/beamform/src/.
"""

from __future__ import annotations

import math

import numpy as np

from beamform_tpu.oracle.engine import OracleWola, OracleWolaByMic

V_SOUND = 343.0


# ---------------------------------------------------------------------------
# Geometry / steering (util.h:52-199), transliterated.
# ---------------------------------------------------------------------------

def oracle_polar(xy):
    """dist/angle computed from raw coords, before mic0 re-referencing
    (util.h:83-84 inside the parse loop)."""
    xy = np.asarray(xy, dtype=np.float64)
    dist = np.array([math.hypot(x, y) for x, y in xy])
    ang = np.array([math.degrees(math.atan2(y, x)) for x, y in xy])
    return dist, ang


def oracle_delays(dist, angle_deg, theta):
    """calculate_delays (util.h:136-161)."""
    m = len(dist)
    tau = np.zeros(m, dtype=np.float64)
    for i in range(1, m):
        a = angle_deg[i] - theta
        if a > 180.0:
            a -= 360.0
        elif a < -180.0:
            a += 360.0
        tau[i] = dist[i] * math.cos(math.radians(a)) / (-V_SOUND)
    return tau


def oracle_freqs(nfft, fs):
    """calculate_frequency_vector (util.h:190-199), quirks included:
    f[N/2-1] overwritten to fs/2, f[N/2] never written (malloc-zero)."""
    f = np.zeros(nfft, dtype=np.float64)
    for i in range(nfft // 2 - 1):
        f[i + 1] = (i + 1) / nfft * fs
        f[nfft - 1 - i] = -(i + 1) / nfft * fs
    f[nfft // 2 - 1] = fs / 2.0
    return f


def oracle_weights(freqs, tau):
    """update_weights with ini=true (das.cpp:27-45): row0 = 1."""
    m = len(tau)
    w = np.empty((m, len(freqs)), dtype=np.complex128)
    w[0, :] = 1.0
    for i in range(1, m):
        w[i, :] = np.exp(-1j * 2.0 * np.pi * freqs * tau[i])
    return w


class _SteeredNode:
    """Shared boilerplate: geometry, freqs, weights, WOLA driver."""

    def __init__(self, xy, hop, fs, theta):
        self.m = len(xy)
        self.hop, self.nfft, self.fs = hop, 2 * hop, fs
        self.dist, self.ang = oracle_polar(xy)
        self.freqs = oracle_freqs(self.nfft, fs)
        self.theta = theta
        self.weights = oracle_weights(
            self.freqs, oracle_delays(self.dist, self.ang, theta))
        self.wola = OracleWola(hop, self.m)

    def set_theta(self, theta):
        """theta_roscallback -> update_weights (das.cpp:94-99): row0 kept."""
        self.theta = theta
        w = oracle_weights(self.freqs,
                           oracle_delays(self.dist, self.ang, theta))
        self.weights[1:, :] = w[1:, :]

    def callback(self, new):
        return self.wola.step(np.asarray(new, dtype=np.float64), self.apply)


class DasOracle(_SteeredNode):
    """das.cpp:47-70: y(f) = w(f)^H x(f) / M per bin."""

    def apply(self, xw):
        in_fft = np.fft.fft(xw, axis=1)
        y = np.empty(self.nfft, dtype=np.complex128)
        for j in range(self.nfft):
            y[j] = np.vdot(self.weights[:, j], in_fft[:, j]) / self.m
        return np.fft.ifft(y).real * self.wola.win


class PhaseOracle(_SteeredNode):
    """phase.cpp:53-134: binary mask from mean pairwise wrapped phase
    distance of phase-aligned mics."""

    def __init__(self, xy, hop, fs, theta, min_phase=10.0, mag_mult=0.1,
                 mag_threshold=0.05):
        super().__init__(xy, hop, fs, theta)
        self.min_phase_diff_mean = min_phase * math.pi / 180.0
        self.mag_mult = mag_mult
        self.mag_threshold = mag_threshold

    def _overall_phase_diff(self, ph):
        total, num = 0.0, 0
        for a in range(self.m - 1):
            for b in range(a + 1, self.m):
                d = abs(ph[a] - ph[b])
                if d > math.pi:
                    d = 2 * math.pi - d
                total += d
                num += 1
        return total, num

    def apply(self, xw):
        in_fft = np.fft.fft(xw, axis=1)
        y = np.empty(self.nfft, dtype=np.complex128)
        y[0] = in_fft[0, 0]
        for j in range(1, self.nfft):
            mag_mean = np.abs(in_fft[:, j]).mean()
            pha = math.atan2(in_fft[0, j].imag, in_fft[0, j].real)
            if mag_mean / self.nfft > self.mag_threshold:
                aligned = np.angle(np.conj(self.weights[:, j]) * in_fft[:, j])
                s, n = self._overall_phase_diff(aligned)
                if s / n < self.min_phase_diff_mean:
                    pass  # keep mag_mean
                else:
                    mag_mean *= self.mag_mult
            else:
                mag_mean *= self.mag_mult
            y[j] = complex(mag_mean * math.cos(pha), mag_mean * math.sin(pha))
        return np.fft.ifft(y).real * self.wola.win


class MvdrOracle(_SteeredNode):
    """mvdr.cpp:62-115: per-bin sample covariance over past_windows FFTs,
    w = R^-1 d / (d^H R^-1 d), band + energy gating, out_amp."""

    def __init__(self, xy, hop, fs, theta, past_windows=10,
                 freq_mag_threshold=1.5, freq_max=4000.0, freq_min=400.0,
                 out_amp=4.5):
        super().__init__(xy, hop, fs, theta)
        self.w_hist = past_windows
        self.th = freq_mag_threshold
        self.fmax, self.fmin, self.out_amp = freq_max, freq_min, out_amp
        self.past = [np.zeros((self.m, past_windows), dtype=np.complex128)
                     for _ in range(self.nfft)]
        self.whiteR = np.ones((self.m, self.m)) + 0.001 * np.eye(self.m)

    def apply(self, xw):
        in_fft = np.fft.fft(xw, axis=1)
        y = np.empty(self.nfft, dtype=np.complex128)
        y[0] = in_fft[0, 0]
        for j in range(1, self.nfft):
            f = abs(self.freqs[j])
            mag = np.abs(in_fft[:, j]).sum() / (self.m * self.nfft)
            if self.fmin <= f <= self.fmax:
                if mag > self.th:
                    p = self.past[j]
                    r = (p @ p.conj().T) * self.whiteR
                    inv = np.linalg.inv(r)
                    d = self.weights[:, j]
                    num = inv @ d
                    den = d.conj() @ inv @ d
                    w = num / den
                    y[j] = np.vdot(w, in_fft[:, j])
                else:
                    y[j] = in_fft[0, j] * 0.01
                # history shifts every in-band frame (mvdr.cpp:100-101)
                self.past[j][:, :-1] = self.past[j][:, 1:]
                self.past[j][:, -1] = in_fft[:, j]
            else:
                y[j] = 0.0
        out = np.fft.ifft(y).real * self.wola.win
        return out * self.out_amp  # mvdr.cpp:112-114 (whole window)


class LcmvOracle(_SteeredNode):
    """lcmv.cpp:44-140: constraint matrix [d_doi, d_int...] per bin,
    w = R^-1 C (C^H R^-1 C)^-1, output column 0."""

    def __init__(self, xy, hop, fs, theta, interference_angles=(),
                 past_windows=10, freq_mag_threshold=1.5, freq_max=4000.0,
                 freq_min=400.0, out_amp=4.5):
        super().__init__(xy, hop, fs, theta)
        self.interf = list(interference_angles)
        self.w_hist = past_windows
        self.th = freq_mag_threshold
        self.fmax, self.fmin, self.out_amp = freq_max, freq_min, out_amp
        self.past = [np.zeros((self.m, past_windows), dtype=np.complex128)
                     for _ in range(self.nfft)]
        self.whiteR = np.ones((self.m, self.m)) + 0.001 * np.eye(self.m)
        self._build_constraints(ini=True)

    def _build_constraints(self, ini=False):
        """update_weights (lcmv.cpp:44-86). C[j] is (M, K+1); row 0 is only
        written when ini=true — after a reallocation the reference leaves it
        zero (allocate_interf_buffers zero-fills, lcmv.cpp:243-252)."""
        k = len(self.interf)
        if ini or not hasattr(self, "C"):
            self.C = np.zeros((self.nfft, self.m, k + 1), dtype=np.complex128)
            if ini:
                self.C[:, 0, :] = 1.0
        tau = oracle_delays(self.dist, self.ang, self.theta)
        for i in range(1, self.m):
            self.C[:, i, 0] = np.exp(-1j * 2 * np.pi * self.freqs * tau[i])
        for kk, a in enumerate(self.interf):
            taui = oracle_delays(self.dist, self.ang, a)
            for i in range(1, self.m):
                self.C[:, i, kk + 1] = np.exp(
                    -1j * 2 * np.pi * self.freqs * taui[i])

    def set_theta(self, theta):
        self.theta = theta
        self._build_constraints(ini=False)

    def interf_event(self, msg_id: int, angle: float,
                     threshold: float = 5.0) -> bool:
        """interf_theta_roscallback (lcmv.cpp:258-309): move with proximity
        REMOVAL, add with proximity rejection; any structural change
        reallocates the zero-filled constraint buffers and the subsequent
        update_weights(ini=false) leaves constraint row 0 ZERO forever.
        Returns True when update_weights ran (a rejected add does not)."""
        k = len(self.interf)
        if 1 <= msg_id <= k:
            self.interf[msg_id - 1] = angle
            for i in range(len(self.interf)):
                if i != msg_id - 1 and abs(self.interf[i]
                                           - angle) < threshold:
                    del self.interf[msg_id - 1]
                    self._realloc()
                    break
            self._build_constraints(ini=False)
            return True
        elif msg_id > k:
            if not any(abs(a - angle) < threshold for a in self.interf):
                self.interf.append(angle)
                self._realloc()
                self._build_constraints(ini=False)
                return True
        return False

    def _realloc(self):
        """allocate_interf_buffers: fresh zero-filled C; row 0 will never be
        rewritten because only ini=true touches it (lcmv.cpp:50-56)."""
        self.C = np.zeros((self.nfft, self.m, len(self.interf) + 1),
                          dtype=np.complex128)

    def apply(self, xw):
        in_fft = np.fft.fft(xw, axis=1)
        y = np.empty(self.nfft, dtype=np.complex128)
        y[0] = in_fft[0, 0]
        for j in range(1, self.nfft):
            f = abs(self.freqs[j])
            mag = np.abs(in_fft[:, j]).sum() / (self.m * self.nfft)
            if self.fmin <= f <= self.fmax:
                if mag > self.th:
                    p = self.past[j]
                    r = (p @ p.conj().T) * self.whiteR
                    inv = np.linalg.inv(r)
                    c = self.C[j]
                    w = (inv @ c) @ np.linalg.inv(c.conj().T @ inv @ c)
                    y[j] = np.vdot(w[:, 0], in_fft[:, j])
                else:
                    y[j] = in_fft[0, j] * 0.01
                self.past[j][:, :-1] = self.past[j][:, 1:]
                self.past[j][:, -1] = in_fft[:, j]
            else:
                y[j] = 0.0
        out = np.fft.ifft(y).real * self.wola.win
        return out * self.out_amp


class GssOracle(LcmvOracle):
    """gss.cpp:51-156: online geometric source separation; demixing W(f)
    initialised to A(f)^H, natural-gradient updates on gated bins."""

    def __init__(self, xy, hop, fs, theta, interference_angles=(),
                 freq_mag_threshold=1.5, freq_max=4000.0, freq_min=400.0,
                 out_amp=4.5, mu=0.01, lam=0.0):
        super().__init__(xy, hop, fs, theta,
                         interference_angles=interference_angles,
                         freq_mag_threshold=freq_mag_threshold,
                         freq_max=freq_max, freq_min=freq_min,
                         out_amp=out_amp)
        self.mu, self.lam = mu, lam
        self.s = len(self.interf) + 1
        # sep_matrix[j] = weights[j].adjoint() (gss.cpp:92)
        self.W = np.conj(np.transpose(self.C, (0, 2, 1))).copy()

    def set_theta(self, theta):
        super().set_theta(theta)
        self.W = np.conj(np.transpose(self.C, (0, 2, 1))).copy()

    def interf_event(self, msg_id: int, angle: float,
                     threshold: float = 5.0) -> bool:
        """gss.cpp:288-339: like LCMV's protocol, and any accepted event's
        update_weights also resets the demixing matrices to A^H
        (gss.cpp:90-93)."""
        updated = super().interf_event(msg_id, angle, threshold)
        if updated:
            self.W = np.conj(np.transpose(self.C, (0, 2, 1))).copy()
            self.s = len(self.interf) + 1
        return updated

    def apply(self, xw):
        in_fft = np.fft.fft(xw, axis=1)
        y = np.empty(self.nfft, dtype=np.complex128)
        s = self.s
        eye = np.eye(s, dtype=np.complex128)
        # gss.cpp:110 — the bin loop starts at j=0 (no DC special case)
        for j in range(0, self.nfft):
            f = abs(self.freqs[j])
            mag = np.abs(in_fft[:, j]).sum() / (self.m * self.nfft)
            if self.fmin <= f <= self.fmax:
                if mag > self.th:
                    x = in_fft[:, j]
                    yf = self.W[j] @ x
                    y[j] = yf[0]
                    e = np.outer(yf, np.conj(yf))
                    np.fill_diagonal(e, 0.0)
                    alpha = float(np.vdot(x, x).real) ** 2
                    dj1 = 4 * s * (1.0 / alpha) * np.outer(e @ yf, np.conj(x))
                    dj2 = (2 * (1.0 / s)
                           * ((self.W[j] @ self.C[j]) - eye)
                           @ self.C[j].conj().T)
                    self.W[j] = ((1 - self.lam * self.mu) * self.W[j]
                                 - self.mu * (dj1 + dj2))
                else:
                    y[j] = in_fft[0, j] * 0.01
            else:
                y[j] = 0.0
        out = np.fft.ifft(y).real * self.wola.win
        return out * self.out_amp


class McraOracle:
    """mcra.cpp:64-155: minima-controlled recursive averaging on mic0.

    Quirks preserved: S_f[0] = |X(0)| (abs of complex, not power,
    mcra.cpp:83); y_fft[0] is never written — the OOB `y_fft[j]` at
    mcra.cpp:127 lands past the buffer — so the DC bin stays 0 forever.
    """

    def __init__(self, xy, hop, fs, alphaS=0.95, alphaD=0.95, alphaD2=0.97,
                 delta=0.001, L=75, out_amp=2.0, out_only_noise=False):
        self.m = len(xy)
        self.hop, self.nfft = hop, 2 * hop
        self.aS, self.aD, self.aD2 = alphaS, alphaD, alphaD2
        self.delta, self.L = delta, L
        self.out_amp, self.only_noise = out_amp, out_only_noise
        n = self.nfft
        self.S_prev = np.zeros(n)
        self.S_tmp = np.zeros(n)
        self.S_min = np.zeros(n)
        self.lam = np.zeros(n)
        self.current_L = 0
        self.first_L = True
        self.wola = OracleWola(hop, self.m)

    def callback(self, new):
        return self.wola.step(np.asarray(new, dtype=np.float64), self.apply)

    def apply(self, xw):
        n = self.nfft
        x = np.fft.fft(xw[0])
        sq = np.abs(x) ** 2
        coefs = [0.25, 0.5, 0.25]
        pos = [-1, 0, 1]
        s_f = np.zeros(n)
        s_f[0] = abs(x[0])
        for j in range(1, n):
            acc = 0.0
            for c, p in zip(coefs, pos):
                tj = j + p
                if 1 <= tj < n:
                    acc += c * sq[tj]
            s_f[j] = acc
        s = self.aS * self.S_prev + (1 - self.aS) * s_f
        if self.current_L > self.L:
            self.S_min = np.minimum(self.S_tmp, s)
            self.S_tmp = s.copy()
            self.current_L = 1
            self.first_L = False
        else:
            self.S_min = np.minimum(self.S_min, s)
            self.S_tmp = np.minimum(self.S_tmp, s)
            self.current_L += 1
        for j in range(n):
            if (self.first_L or s[j] < self.S_min[j] * self.delta
                    or self.lam[j] > sq[j]):
                if self.first_L and (1.0 / self.current_L) > self.aD:
                    a = 1.0 / self.current_L
                    self.lam[j] = a * self.lam[j] + (1 - a) * sq[j]
                else:
                    self.lam[j] = (self.aD2 * self.lam[j]
                                   + (1 - self.aD) * sq[j])
        y = np.zeros(n, dtype=np.complex128)  # y[0] stays 0 (quirk)
        for j in range(1, n):
            pha = math.atan2(x[j].imag, x[j].real)
            if self.only_noise:
                mag = math.sqrt(self.lam[j]) * self.out_amp
            else:
                mag = (abs(x[j]) - math.sqrt(self.lam[j])) * self.out_amp
                if mag < 0:
                    mag = 0.0
            y[j] = complex(mag * math.cos(pha), mag * math.sin(pha))
        self.S_prev = s.copy()
        return np.fft.ifft(y).real * self.wola.win


class PhasempfOracle(_SteeredNode):
    """phasempf.cpp:140-302 + the output smoother at phasempf.cpp:330-334.

    Quirks preserved: the embedded MCRA's frequency smoothing reads
    ``out_soi_square[j]`` instead of ``[this_j]`` (phasempf.cpp:150) so each
    bin is scaled by the sum of in-range kernel coefficients; the
    reverberation update uses ``(1 - gamma/delta)`` (phasempf.cpp:265-266);
    the DC output bin is never written (OOB at phasempf.cpp:274).
    """

    def __init__(self, xy, hop, fs, theta, min_phase=10.0, min_mag=10.0,
                 smooth_size=20, MCRA_alphaS=0.95, MCRA_alphaD=0.95,
                 MCRA_alphaD2=0.97, MCRA_delta=0.001, MCRA_L=75,
                 MPF_alphaS=0.3, MPF_eta=0.3, MPF_rev_gamma=0.3,
                 MPF_rev_delta=1.0, out_amp=2.0, noise_floor=0.001,
                 out_only_noise=False, out_only_mcra=False):
        super().__init__(xy, hop, fs, theta)
        self.min_phase_diff_mean = min_phase * math.pi / 180.0
        self.min_mag = min_mag
        self.smooth_size = smooth_size
        self.aS, self.aD, self.aD2 = MCRA_alphaS, MCRA_alphaD, MCRA_alphaD2
        self.mdelta, self.L = MCRA_delta, MCRA_L
        self.mpf_aS, self.eta = MPF_alphaS, MPF_eta
        self.gamma, self.rdelta = MPF_rev_gamma, MPF_rev_delta
        self.out_amp, self.noise_floor = out_amp, noise_floor
        self.only_noise, self.only_mcra = out_only_noise, out_only_mcra
        n = self.nfft
        self.S_prev = np.zeros(n)
        self.S_tmp = np.zeros(n)
        self.S_min = np.zeros(n)
        self.lam_noise = np.zeros(n)
        self.Z = np.zeros(n)
        self.lam_rev = np.zeros((2, n))
        self.current_L = 0
        self.first_L = True
        self.past_samples = np.zeros(smooth_size)

    def _overall_phase_diff(self, ph):
        total, num = 0.0, 0
        for a in range(self.m - 1):
            for b in range(a + 1, self.m):
                d = abs(ph[a] - ph[b])
                if d > math.pi:
                    d = 2 * math.pi - d
                total += d
                num += 1
        return total, num

    def _mcra(self, soi, soi_sq):
        n = self.nfft
        coefs = [0.25, 0.5, 0.25]
        pos = [-1, 0, 1]
        s_f = np.zeros(n)
        s_f[0] = abs(soi[0])
        for j in range(1, n):
            acc = 0.0
            for c, p in zip(coefs, pos):
                tj = j + p
                if 1 <= tj < n:
                    acc += c * soi_sq[j]  # [j], not [tj] — quirk
            s_f[j] = acc
        s = self.aS * self.S_prev + (1 - self.aS) * s_f
        if self.current_L > self.L:
            self.S_min = np.minimum(self.S_tmp, s)
            self.S_tmp = s.copy()
            self.current_L = 1
            self.first_L = False
        else:
            self.S_min = np.minimum(self.S_min, s)
            self.S_tmp = np.minimum(self.S_tmp, s)
            self.current_L += 1
        for j in range(n):
            if (self.first_L or s[j] < self.S_min[j] * self.mdelta
                    or self.lam_noise[j] > soi_sq[j]):
                if self.first_L and (1.0 / self.current_L) > self.aD:
                    a = 1.0 / self.current_L
                    self.lam_noise[j] = (a * self.lam_noise[j]
                                         + (1 - a) * soi_sq[j])
                else:
                    self.lam_noise[j] = (self.aD2 * self.lam_noise[j]
                                         + (1 - self.aD) * soi_sq[j])
        self.S_prev = s.copy()

    def apply(self, xw):
        n = self.nfft
        in_fft = np.fft.fft(xw, axis=1)
        soi = np.empty(n, dtype=np.complex128)
        out_int = np.empty(n, dtype=np.complex128)
        soi[0] = in_fft[0, 0]
        out_int[0] = in_fft[0, 0]
        soi_sq = np.zeros(n)
        int_sq = np.zeros(n)
        for j in range(1, n):
            aligned = np.angle(np.conj(self.weights[:, j]) * in_fft[:, j])
            s, num = self._overall_phase_diff(aligned)
            diff_mean = s / num
            mag_mean = np.abs(in_fft[:, j]).mean()
            pha = math.atan2(in_fft[0, j].imag, in_fft[0, j].real)
            big = complex(mag_mean * math.cos(pha), mag_mean * math.sin(pha))
            small_mag = mag_mean * self.min_mag
            small = complex(small_mag * math.cos(pha),
                            small_mag * math.sin(pha))
            if diff_mean < self.min_phase_diff_mean:
                soi[j], out_int[j] = big, small
            else:
                soi[j], out_int[j] = small, big
            soi_sq[j] = abs(soi[j]) ** 2
            int_sq[j] = abs(out_int[j]) ** 2
        self._mcra(soi, soi_sq)
        lam = np.zeros(n)
        for j in range(n):
            self.Z[j] = self.mpf_aS * self.Z[j] + (1 - self.mpf_aS) * int_sq[j]
            leak = self.eta * self.Z[j]
            self.lam_rev[0, j] = (self.gamma * self.lam_rev[0, j]
                                  + (1 - self.gamma / self.rdelta) * soi_sq[j])
            self.lam_rev[1, j] = (self.gamma * self.lam_rev[1, j]
                                  + (1 - self.gamma / self.rdelta) * int_sq[j])
            lam[j] = math.sqrt(self.lam_noise[j] + leak
                               + self.lam_rev[0, j] + self.lam_rev[1, j])
        y = np.zeros(n, dtype=np.complex128)  # y[0] stays 0 (quirk)
        for j in range(1, n):
            pha = math.atan2(soi[j].imag, soi[j].real)
            if self.only_noise:
                mag = lam[j] * self.out_amp
            else:
                if self.only_mcra:
                    mag = (abs(soi[j])
                           - math.sqrt(self.lam_noise[j])) * self.out_amp
                else:
                    mag = (abs(soi[j]) - lam[j]) * self.out_amp
                if mag < 0:
                    mag = self.noise_floor
            y[j] = complex(mag * math.cos(pha), mag * math.sin(pha))
        return np.fft.ifft(y).real * self.wola.win

    def callback(self, new):
        out = self.wola.step(np.asarray(new, dtype=np.float64), self.apply)
        # time-domain moving-average smoother (phasempf.cpp:330-334)
        sm = np.empty_like(out)
        for j in range(len(out)):
            self.past_samples[:-1] = self.past_samples[1:]
            self.past_samples[-1] = out[j]
            sm[j] = self.past_samples.mean()
        return sm


class GscOracle(_SteeredNode):
    """gsc.cpp:54-197: per-mic phase alignment via the by-mic WOLA path, then
    a per-sample time-domain adaptive sidelobe canceller with dynamic mu."""

    def __init__(self, xy, hop, fs, theta, use_vad=False, vad_threshold=0.1,
                 mu0=0.0005, mu_max=0.01, filter_size=128):
        super().__init__(xy, hop, fs, theta)
        self.use_vad, self.vad_th = use_vad, vad_threshold
        self.mu0, self.mu_max, self.k = mu0, mu_max, filter_size
        self.block = np.zeros((self.m - 1, filter_size))
        self.filt = np.zeros((self.m - 1, filter_size))
        self.last_out = np.zeros(filter_size)
        self.wola_bymic = OracleWolaByMic(hop, self.m)

    def _apply_bymic(self, xw_i, mic):
        x = np.fft.fft(xw_i)
        x = x * np.conj(self.weights[mic])
        return np.fft.ifft(x).real * self.wola_bymic.win

    def callback(self, new):
        new = np.asarray(new, dtype=np.float64)
        aligned = self.wola_bymic.step(new, self._apply_bymic)  # (M, hop)
        out = np.zeros(self.hop)
        k = self.k
        for j in range(self.hop):
            das = aligned[:, j].mean()
            out[j] = das
            for i in range(self.m - 1):
                self.block[i, :-1] = self.block[i, 1:]
                self.block[i, -1] = aligned[i + 1, j] - aligned[i, j]
                out[j] -= float(self.filt[i] @ self.block[i])
            self.last_out[:-1] = self.last_out[1:]
            self.last_out[-1] = out[j]
            last_pow = np.sqrt(np.mean(self.last_out ** 2))
            if last_pow < self.vad_th or not self.use_vad:
                for i in range(self.m - 1):
                    bp = np.sqrt(np.mean(self.block[i] ** 2))
                    # IEEE division like the C++ (inf/nan on zero powers,
                    # gsc.cpp:152-159)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        if self.mu0 * bp / last_pow < self.mu_max:
                            mu = self.mu0 / last_pow
                        else:
                            mu = self.mu0 / bp
                    if np.isnan(mu) or np.isinf(mu):
                        mu = 0.0
                    self.filt[i] += mu * out[j] * self.block[i]
                    self.filt[i] = np.where(np.isnan(self.filt[i]), 0.0,
                                            self.filt[i])
        return out


class RefOracle:
    """jack_ref.cpp:19-30: mic0 through the identity WOLA path (the
    sample-aligned evaluation reference)."""

    def __init__(self, hop):
        self.hop = hop
        self.wola = OracleWolaByMic(hop, 1)

    def callback(self, new):
        new = np.asarray(new, dtype=np.float64)

        def apply(xw_i, mic):
            return xw_i * self.wola.win

        return self.wola.step(new[:1], apply)[0]


class ReadOracle:
    """jack_read.cpp:10-43: pass through the loudest mic per window."""

    def __init__(self):
        self.max_past = -1

    def callback(self, new):
        new = np.asarray(new, dtype=np.float64)
        max_i, max_e = -1, 0.0
        for i in range(new.shape[0]):
            e = np.abs(new[i] * 100.0).sum()
            if e > max_e or self.max_past == -1:
                max_e, max_i = e, i
                if self.max_past == -1:
                    self.max_past = max_i
        if max_i == -1:
            max_i = self.max_past
        self.max_past = max_i
        return new[max_i]
