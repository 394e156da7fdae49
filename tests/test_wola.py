"""WOLA engine: perfect reconstruction, latency, oracle equivalence."""

import numpy as np
import jax.numpy as jnp

from beamform_tpu.dsp.wola import (
    frame_signal, overlap_add, sqrt_hann, analyze, synthesize)
from beamform_tpu.oracle.engine import OracleWola, sqrt_hann as o_hann


def test_sqrt_hann_matches_oracle():
    np.testing.assert_allclose(sqrt_hann(256), o_hann(256), rtol=0, atol=0)


def test_frame_layout():
    hop = 8
    x = np.arange(1, 33, dtype=np.float64)
    f = np.asarray(frame_signal(x, hop))
    assert f.shape == (4, 16)
    # frame 0: one hop of ring-buffer zeros then the first hop of samples
    np.testing.assert_array_equal(f[0], np.r_[np.zeros(8), x[:8]])
    np.testing.assert_array_equal(f[1], x[0:16])
    np.testing.assert_array_equal(f[3], x[16:32])


def test_perfect_reconstruction_identity_path():
    """The rosjack_ref path: window twice, overlap-add -> input delayed by
    one hop (jack_ref.cpp:19-30; sqrt-Hann halves sum to 1)."""
    hop = 128
    rng = np.random.default_rng(1)
    x = rng.standard_normal(hop * 10)
    win = sqrt_hann(2 * hop)
    p = np.asarray(frame_signal(x, hop)) * win * win
    y = np.asarray(overlap_add(jnp.asarray(p), hop))
    np.testing.assert_allclose(y[hop:], x[:-hop], atol=1e-12)
    np.testing.assert_allclose(y[:hop], 0.5 * x[:hop] * 0.0 + y[:hop])  # defined


def test_fft_roundtrip_matches_identity():
    hop = 64
    rng = np.random.default_rng(2)
    x = rng.standard_normal(hop * 6)
    win = sqrt_hann(2 * hop)
    spec = analyze(x, hop, win, cdtype=jnp.complex128)
    y = np.asarray(synthesize(spec, hop, win))
    np.testing.assert_allclose(y[hop:], x[:-hop], atol=1e-10)


def test_oracle_wola_equivalence():
    """Batched framing/OLA == per-callback ring-buffer simulation."""
    hop, m = 32, 3
    rng = np.random.default_rng(3)
    x = rng.standard_normal((m, hop * 7))
    win = sqrt_hann(2 * hop)

    # jax batched path with a passthrough "weight" function on mic0
    frames = np.asarray(frame_signal(x, hop))       # (M, T, 2h)
    p = frames[0] * win * win
    y_batched = np.asarray(overlap_add(jnp.asarray(p), hop))

    # oracle per-callback path
    wola = OracleWola(hop, m)
    outs = []
    for t in range(x.shape[1] // hop):
        new = x[:, t * hop:(t + 1) * hop]
        outs.append(wola.step(new, lambda xw: xw[0] * wola.win))
    y_oracle = np.concatenate(outs)
    np.testing.assert_allclose(y_batched, y_oracle, atol=1e-12)
