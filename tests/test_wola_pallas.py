"""Fused WOLA kernels == the reference stft/istft path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beamform_tpu.config import EngineConfig
from beamform_tpu.models import common
from beamform_tpu.kernels.wola_pallas import stft_planes, istft_ext_fused

HOP = 128


def _engine():
    return EngineConfig(sample_rate=48000, window_size=HOP, dtype="float32")


def test_stft_planes_matches_stft_ext_carry():
    engine = _engine()
    m, t = 3, 12
    rng = np.random.default_rng(0)
    x = rng.standard_normal((m, t * HOP)).astype(np.float32)
    tail = rng.standard_normal((m, HOP)).astype(np.float32)
    window = common.make_window(engine, jnp.float32)

    ref, ref_tail = common.stft_ext_carry(jnp.asarray(x), engine, window,
                                          jnp.complex64, jnp.asarray(tail))
    sr, si, mag, new_tail = jax.jit(
        lambda *a: stft_planes(*a, engine, interpret=True)
    )(jnp.asarray(x), jnp.asarray(tail), window)

    nb = ref.shape[-1]                       # h + 2 extended layout
    got = np.asarray(sr)[:, :, :nb] + 1j * np.asarray(si)[:, :, :nb]
    ref = np.asarray(ref)                    # (T, M, NB)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-5, (
        np.abs(got - ref).max() / scale)
    np.testing.assert_array_equal(np.asarray(new_tail), x[:, -HOP:])

    # fused energy-gate magnitude == mean |X| / (M * nfft)
    ref_mag = np.asarray(common.mag_mean_over_mics(ref, engine.fft_win))
    got_mag = np.asarray(mag)[:, :nb]
    assert np.abs(got_mag - ref_mag).max() / ref_mag.max() < 1e-5

    # the shadow bin is the natural full-DFT bin h+1
    h = engine.fft_win // 2
    np.testing.assert_allclose(got[..., h + 1], np.conj(got[..., h - 1]),
                               rtol=0, atol=scale * 1e-6)


def test_istft_fused_matches_istft_ext_carry():
    engine = _engine()
    t = 10
    rng = np.random.default_rng(1)
    nb = engine.fft_win // 2 + 2
    y = (rng.standard_normal((t, nb))
         + 1j * rng.standard_normal((t, nb))).astype(np.complex64)
    out_prev = rng.standard_normal(HOP).astype(np.float32)
    window = common.make_window(engine, jnp.float32)

    ref, ref_prev = common.istft_ext_carry(jnp.asarray(y), engine, window,
                                           jnp.asarray(out_prev))
    got, got_prev = jax.jit(
        lambda yy, ww, pp: istft_ext_fused(yy, engine, ww, pp,
                                           interpret=True)
    )(jnp.asarray(y), window, jnp.asarray(out_prev))

    ref = np.asarray(ref)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(got) - ref).max() / scale < 1e-5
    assert np.abs(np.asarray(got_prev)
                  - np.asarray(ref_prev)).max() / scale < 1e-5


def test_roundtrip_reconstruction():
    """stft -> pick mic0 -> istft reconstructs the delayed input (WOLA
    identity), all through the fused kernels."""
    engine = _engine()
    t = 16
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, t * HOP)).astype(np.float32)
    window = common.make_window(engine, jnp.float32)
    tail = np.zeros((1, HOP), np.float32)

    sr, si, _, _ = jax.jit(
        lambda *a: stft_planes(*a, engine, with_mag=False, interpret=True)
    )(jnp.asarray(x), jnp.asarray(tail), window)
    nb = engine.fft_win // 2 + 2
    y = jax.lax.complex(sr[:, 0, :nb], si[:, 0, :nb])
    out, _ = jax.jit(
        lambda yy, ww, pp: istft_ext_fused(yy, engine, ww, pp,
                                           interpret=True)
    )(y, window, jnp.zeros(HOP, jnp.float32))
    out = np.asarray(out)
    # one hop of algorithmic latency; skip the initial transient
    ref = x[0, : (t - 1) * HOP]
    got = out[HOP:]
    err = np.abs(got - ref)[HOP:]            # skip the ramp-in hop too
    assert err.max() < 1e-5 * max(1.0, np.abs(ref).max())


def test_stft_planes_wide_channel_chunking():
    """B*M-channel batched analysis (beyond MAX_CHANNELS_PER_BLOCK) chunks
    channels over a second grid dimension and matches the narrow path."""
    engine = _engine()
    m, t = 40, 6                      # > 32 forces the chunked grid
    rng = np.random.default_rng(7)
    x = rng.standard_normal((m, t * HOP)).astype(np.float32)
    tail = rng.standard_normal((m, HOP)).astype(np.float32)
    window = common.make_window(engine, jnp.float32)

    sr, si, _, _ = jax.jit(
        lambda *a: stft_planes(*a, engine, with_mag=False, interpret=True)
    )(jnp.asarray(x), jnp.asarray(tail), window)
    ref, _ = common.stft_ext_carry(jnp.asarray(x), engine, window,
                                   jnp.complex64, jnp.asarray(tail))
    nb = ref.shape[-1]
    got = np.asarray(sr)[:, :, :nb] + 1j * np.asarray(si)[:, :, :nb]
    scale = np.abs(np.asarray(ref)).max()
    assert np.abs(got - np.asarray(ref)).max() / scale < 1e-5


def test_istft_fused_batched_matches_per_stream():
    """Channel-batched synthesis == per-stream synthesis (each channel has
    its own OLA carry marching the minor grid axis)."""
    engine = _engine()
    c, t = 5, 9
    rng = np.random.default_rng(11)
    nb = engine.fft_win // 2 + 2
    y = (rng.standard_normal((c, t, nb))
         + 1j * rng.standard_normal((c, t, nb))).astype(np.complex64)
    prev = rng.standard_normal((c, HOP)).astype(np.float32)
    window = common.make_window(engine, jnp.float32)

    outb, prevb = jax.jit(
        lambda yy, pp: istft_ext_fused(yy, engine, window, pp,
                                       interpret=True)
    )(jnp.asarray(y), jnp.asarray(prev))
    for i in range(c):
        oi, pi = jax.jit(
            lambda yy, pp: istft_ext_fused(yy, engine, window, pp,
                                           interpret=True)
        )(jnp.asarray(y[i]), jnp.asarray(prev[i]))
        np.testing.assert_allclose(np.asarray(outb[i]), np.asarray(oi),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(prevb[i]), np.asarray(pi),
                                   atol=1e-6)
