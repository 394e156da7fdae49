"""Native C++ audio runtime (csrc/beamio): WAV I/O parity with the Python
implementation, ring buffer, streaming resampler, chunked WAV streaming."""

import numpy as np
import pytest

from beamform_tpu.runtime import native
from beamform_tpu.runtime import wav as pywav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++/native build unavailable")


def test_wav_roundtrip_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(0.3 * rng.standard_normal((2, 777)), -1, 0.999)
    p_native = str(tmp_path / "n.wav")
    p_python = str(tmp_path / "p.wav")
    native.write_wav(p_native, x, 48000, fmt="pcm16")
    pywav.write_wav(p_python, x.astype(np.float32), 48000, fmt="pcm16")
    # identical bytes: the float->PCM16 conversion (lrint+wrap) must match
    assert open(p_native, "rb").read() == open(p_python, "rb").read()

    yn, fsn = native.read_wav(p_native)
    yp, fsp = pywav.read_wav(p_python)
    assert fsn == fsp == 48000
    np.testing.assert_allclose(yn, yp, atol=1e-7)


@pytest.mark.parametrize("fmt", ["pcm24", "pcm32", "float32"])
def test_wav_formats_cross_readable(tmp_path, fmt):
    rng = np.random.default_rng(1)
    x = np.clip(0.5 * rng.standard_normal((1, 500)), -1, 0.999)
    p = str(tmp_path / f"x_{fmt}.wav")
    native.write_wav(p, x, 16000, fmt=fmt)
    y_py, fs = pywav.read_wav(p)          # python reads native output
    tol = {"pcm24": 2 ** -22, "pcm32": 1e-7, "float32": 1e-6}[fmt]
    np.testing.assert_allclose(y_py, x, atol=tol)
    y_nat, _ = native.read_wav(p)          # native reads its own output
    np.testing.assert_allclose(y_nat, x, atol=tol)


def test_ring_buffer():
    rb = native.RingBuffer(1024)
    a = np.arange(300, dtype=np.float32)
    assert rb.write(a) == 300
    assert rb.available == 300
    out = rb.read(100)
    np.testing.assert_array_equal(out, a[:100])
    assert rb.write(np.ones(900, np.float32)) <= 1024 - 200  # capacity bound
    out2 = rb.read(5000)
    assert out2[:200].tolist() == a[100:300].tolist()


def test_streaming_resampler_tone():
    src = native.Resampler(48000, 16000)
    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    outs = [src.process(x[i:i + 4800]) for i in range(0, 48000, 4800)]
    y = np.concatenate(outs)
    assert abs(len(y) - 16000) < 200
    # steady-state: a 440 Hz tone survives with the right frequency and
    # constant (possibly fractional) SRC latency -> high lagged correlation
    ref = np.sin(2 * np.pi * 440.0 * np.arange(20000) / 16000.0)
    best = max(range(80), key=lambda lag: np.corrcoef(
        y[200:4000], ref[200 + lag:4000 + lag])[0, 1])
    c = np.corrcoef(y[200:4000], ref[200 + best:4000 + best])[0, 1]
    assert c > 0.995
    # streaming chunking must be seam-free: reprocess in one call
    src2 = native.Resampler(48000, 16000)
    y_one = src2.process(x)
    n = min(len(y_one), len(y))
    np.testing.assert_allclose(y[:n], y_one[:n], atol=1e-6)


def test_wav_stream_chunks(tmp_path):
    rng = np.random.default_rng(2)
    x = 0.2 * rng.standard_normal((3, 1000)).astype(np.float32)
    p = str(tmp_path / "s.wav")
    native.write_wav(p, x, 48000, fmt="float32")
    st = native.WavStream(p)
    assert (st.channels, st.sample_rate, st.frames) == (3, 48000, 1000)
    chunks, got = [], 0
    while got < st.frames:
        c, n = st.read(256)
        chunks.append(c[:, :n] if n else c)
        if n == 0:
            break
        got += n
    y = np.concatenate([c for c in chunks], axis=1)[:, :1000]
    np.testing.assert_allclose(y, x, atol=1e-6)
    # EOF behavior: zero-padded, 0 frames read
    c, n = st.read(64)
    assert n == 0 and not c.any()
    st.close()


def test_alsa_backend_degrades_gracefully():
    """The in-process audio-device backend (the reference's JACK-client
    role, rosjack.cpp:102-157) binds libasound at RUNTIME via dlopen: the
    library must build and load on hosts with no ALSA at all, report
    availability honestly, and fail open() with a readable reason."""
    lib = native.load()
    assert lib is not None
    avail = native.alsa_available()
    assert avail in (True, False)
    if not avail:       # this environment: no sound stack at all
        import pytest
        with pytest.raises(RuntimeError, match="(?i)alsa|asound"):
            native.AlsaPcm("default", capture=True, channels=2, rate=48000)
    else:               # a machine with ALSA: open may still fail (no
        try:            # device) but must not crash
            pcm = native.AlsaPcm("default", capture=False, channels=1,
                                 rate=48000)
            pcm.close()
        except RuntimeError:
            pass


def test_cli_device_mode_degrades(capsys):
    """`--live --device` on a host without a sound stack exits 2 with the
    reason and the pipe-mode hint, before any expensive compile."""
    from beamform_tpu.runtime.cli import main

    if native.alsa_available():
        import pytest
        pytest.skip("host has a real ALSA runtime")
    rc = main(["das", "--live", "--device", "default",
               "--live-channels", "2"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "ALSA" in err or "asound" in err
    assert "pipe mode" in err
