"""WAV I/O, sample-rate conversion, and the CLI surface."""

import json
import subprocess
import sys

import numpy as np
import pytest

from beamform_tpu.runtime import wav as wav_io
from beamform_tpu.runtime.resample import resample


def test_wav_pcm16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal((2, 1000)) * 0.3, -1, 0.999)
    p = str(tmp_path / "t.wav")
    wav_io.write_wav(p, x, 48000, fmt="pcm16")
    y, fs = wav_io.read_wav(p)
    assert fs == 48000 and y.shape == x.shape
    # 16-bit quantisation error bound
    assert np.max(np.abs(y - x)) <= 1.0 / 32768.0 + 1e-12


def test_wav_pcm16_matches_libsndfile_conversion(tmp_path):
    """libsndfile float->PCM16 without clipping: lrint(x*32768), wraps."""
    x = np.array([0.5, -0.5, 1.0 - 1/32768, 0.25000001, 1.5 / 32768])
    p = str(tmp_path / "q.wav")
    wav_io.write_wav(p, x, 48000)
    import struct
    blob = open(p, "rb").read()
    data = np.frombuffer(blob[44:], dtype="<i2")
    expect = np.rint(x * 32768.0).astype(np.int64).astype(np.int16)
    np.testing.assert_array_equal(data, expect)


@pytest.mark.parametrize("fmt,tol", [("pcm24", 2 ** -23), ("pcm32", 1e-7),
                                     ("float32", 1e-7)])
def test_wav_other_formats(tmp_path, fmt, tol):
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal((1, 333)) * 0.5, -1, 0.999)
    p = str(tmp_path / f"{fmt}.wav")
    wav_io.write_wav(p, x, 16000, fmt=fmt)
    y, fs = wav_io.read_wav(p)
    assert fs == 16000
    assert np.max(np.abs(y - x)) <= tol + 1e-12


def test_resample_preserves_tone():
    fs_in, fs_out = 48000, 16000
    t = np.arange(fs_in) / fs_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample(x, fs_in, fs_out))
    assert y.shape[0] == fs_out
    t2 = np.arange(fs_out) / fs_out
    ref = np.sin(2 * np.pi * 440.0 * t2)
    # ignore filter edges
    err = np.abs(y[200:-200] - ref[200:-200])
    assert err.max() < 1e-3


def test_resample_upsample_ratio():
    y = np.asarray(resample(np.zeros(1000, np.float32), 16000, 48000))
    assert y.shape[0] == 3000


def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    x = 0.1 * rng.standard_normal((3, 48000 // 4))
    wav_in = str(tmp_path / "in.wav")
    wav_out = str(tmp_path / "out.wav")
    wav_io.write_wav(wav_in, x, 48000, fmt="float32")

    import beamform_tpu
    cfg_dir = beamform_tpu.__path__[0] + "/configs"
    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", "das",
           "--in", wav_in, "--out", wav_out,
           "--array-config", f"{cfg_dir}/aira3.yaml",
           "--theta", "15", "--window-size", "256", "--report-json"]
    env = dict(JAX_PLATFORMS="cpu", PATH="/usr/bin:/bin")
    import os
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["node"] == "das"
    y, fs = wav_io.read_wav(wav_out)
    assert fs == 48000
    assert y.shape[1] >= x.shape[1]
    assert np.isfinite(y).all()


def test_cli_theta_timeline_spec(tmp_path):
    rng = np.random.default_rng(3)
    x = 0.1 * rng.standard_normal((3, 8192))
    wav_in = str(tmp_path / "in.wav")
    wav_io.write_wav(wav_in, x, 48000, fmt="float32")
    import beamform_tpu, os
    cfg_dir = beamform_tpu.__path__[0] + "/configs"
    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", "phase",
           "--in", wav_in, "--array-config", f"{cfg_dir}/aira3.yaml",
           "--theta-timeline", "0:10,0.08:-45", "--window-size", "256",
           "--report-json"]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]


def test_cli_stream_mode_with_checkpoint(tmp_path):
    rng = np.random.default_rng(5)
    x = 0.1 * rng.standard_normal((3, 16 * 256))
    wav_in = str(tmp_path / "in.wav")
    wav_io.write_wav(wav_in, x, 48000, fmt="float32")
    import beamform_tpu, os
    cfg_dir = beamform_tpu.__path__[0] + "/configs"
    ck = str(tmp_path / "state.npz")
    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", "mcra",
           "--in", wav_in, "--array-config", f"{cfg_dir}/aira3.yaml",
           "--window-size", "256", "--stream", "4", "--save-state", ck,
           "--param", "L=5", "--report-json"]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-1500:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["streaming"]["chunks"] == 4
    import numpy as _np
    assert os.path.exists(ck)
    # resume from the checkpoint
    cmd2 = cmd[:-5] + ["--load-state", ck, "--param", "L=5", "--report-json"]
    r2 = subprocess.run(cmd2, capture_output=True, text=True,
                        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r2.returncode == 0, r2.stderr[-1500:]


def test_cli_wav_write_failure_degrades(tmp_path):
    rng = np.random.default_rng(6)
    x = 0.1 * rng.standard_normal((3, 1024))
    wav_in = str(tmp_path / "in.wav")
    wav_io.write_wav(wav_in, x, 48000, fmt="float32")
    import beamform_tpu, os
    cfg_dir = beamform_tpu.__path__[0] + "/configs"
    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", "das",
           "--in", wav_in, "--out", "/nonexistent-dir/out.wav",
           "--array-config", f"{cfg_dir}/aira3.yaml",
           "--window-size", "256", "--report-json"]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-1500:]   # degrades, does not crash
    assert "continuing without file output" in r.stderr


def test_cli_stream_with_interference_events(tmp_path):
    rng = np.random.default_rng(7)
    x = 0.1 * rng.standard_normal((3, 13 * 256))   # odd length: padded tail
    wav_in = str(tmp_path / "in.wav")
    wav_io.write_wav(wav_in, x, 48000, fmt="float32")
    import beamform_tpu, os
    cfg_dir = beamform_tpu.__path__[0] + "/configs"
    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", "lcmv",
           "--in", wav_in, "--array-config", f"{cfg_dir}/aira3.yaml",
           "--window-size", "256", "--stream", "4",
           "--param", "freq_mag_threshold=0.001",
           "--interference-events", "0.02:1:70", "--report-json"]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-1500:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["streaming"]["chunks"] == 4


def test_cli_live_pipe_mode(tmp_path):
    """Live mode: raw float32 PCM through stdin/stdout (the JACK-client
    role), sample counts preserved, xrun accounting reported."""
    import os
    rng = np.random.default_rng(8)
    s = 16 * 256
    x = (0.1 * rng.standard_normal((s, 3))).astype("<f4")
    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", "das", "--live",
           "--live-channels", "3", "--window-size", "256",
           "--live-chunk", "4", "--theta", "15"]
    r = subprocess.run(cmd, input=x.tobytes(), capture_output=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-1200:].decode()
    y = np.frombuffer(r.stdout, dtype="<f4")
    assert len(y) == s
    assert np.isfinite(y).all()
    live = json.loads([l for l in r.stderr.decode().splitlines()
                       if '"live"' in l][-1])["live"]
    assert live["chunks"] == 4
