"""rosjack_write playback role + live theta control.

Covers the reference's ROS->JACK decoupling buffer semantics
(rosjack.cpp:212-215, 549-577; jack_write.cpp:7-10) and the /theta live
side channel (das.cpp:94-99) — VERDICT round-1 items 3 and 4.
"""

import json
import os
import subprocess
import sys

import numpy as np

from beamform_tpu.runtime.playback import Ros2JackBuffer, play_stream

CPU_ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def test_buffer_pass_through():
    """Steady state (one message per callback): bit-exact pass-through."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10 * 64).astype(np.float32)
    y = play_stream(x.reshape(-1, 64), 64)
    np.testing.assert_array_equal(y, x)


def test_buffer_underrun_plays_silence():
    buf = Ros2JackBuffer(64, windows=4)
    out = buf.pop(64)
    np.testing.assert_array_equal(out, np.zeros(64, np.float32))
    assert buf.underruns == 1
    # audio arriving later still plays (reader is now mid-ring)
    buf.push(np.ones(64, np.float32))
    assert buf._fill() == 0  # reader ahead: the ring decouples, lag follows


def test_buffer_overrun_overwrites_oldest():
    """A producer 52 windows ahead wraps the 50-window ring and overwrites
    the oldest audio silently (no occupancy tracking in the reference)."""
    ws = 8
    buf = Ros2JackBuffer(ws, windows=4)          # period = 4*8+1 samples
    for k in range(6):
        buf.push(np.full(ws, float(k), np.float32))
    assert getattr(buf, "overwrites", 0) > 0
    popped = np.concatenate([buf.pop(ws) for _ in range(5)])
    # the newest write survives in the ring; the oldest was overwritten
    assert 5.0 in popped
    assert 0.0 not in popped[:ws]   # window 0 no longer at the front


def test_buffer_reader_zeroes_slots():
    ws = 16
    buf = Ros2JackBuffer(ws, windows=2)
    buf.push(np.ones(ws, np.float32))
    first = buf.pop(ws)
    np.testing.assert_array_equal(first, np.ones(ws, np.float32))
    # wrap the reader around the full period: every slot reads as zero now
    period = buf._period
    again = np.concatenate([buf.pop(ws) for _ in range(period // ws + 1)])
    np.testing.assert_array_equal(again, np.zeros_like(again))


def test_cli_write_node_file_mode(tmp_path):
    from beamform_tpu.runtime import wav as wav_io
    rng = np.random.default_rng(1)
    x = np.clip(0.1 * rng.standard_normal((1, 8 * 256)), -1, 1)
    wav_in = str(tmp_path / "in.wav")
    wav_out = str(tmp_path / "out.wav")
    wav_io.write_wav(wav_in, x, 48000, fmt="float32")
    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", "write",
           "--in", wav_in, "--out", wav_out, "--window-size", "256",
           "--out-format", "float32", "--report-json"]
    r = subprocess.run(cmd, capture_output=True, text=True, env=CPU_ENV)
    assert r.returncode == 0, r.stderr[-1500:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["node"] == "write"
    y, fs = wav_io.read_wav(wav_out)
    np.testing.assert_allclose(y[0], x[0], atol=1e-7)


def test_live_theta_control_matches_offline_timeline(tmp_path):
    """Drive the live pipe with a mid-stream theta change through the
    control file; output must equal the same chunks processed offline with
    the corresponding per-chunk angles (VERDICT item 4 done-criterion)."""
    hop, chunk_hops, ch = 256, 2, 3
    chunk = chunk_hops * hop
    rng = np.random.default_rng(2)
    blocks = [(0.1 * rng.standard_normal((chunk, ch))).astype("<f4")
              for _ in range(3)]
    ctl = tmp_path / "theta.ctl"
    ctl.write_text("10.0\n")

    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", "das", "--live",
           "--live-channels", str(ch), "--window-size", str(hop),
           "--live-chunk", str(chunk_hops), "--theta", "10",
           "--theta-control", str(ctl)]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, env=CPU_ENV)
    out = b""
    thetas = [10.0, 10.0, -40.0]
    try:
        for i, (blk, th) in enumerate(zip(blocks, thetas)):
            ctl.write_text(f"{th}\n")
            proc.stdin.write(blk.tobytes())
            proc.stdin.flush()
            # synchronize on the chunk's output: the live loop is strictly
            # read -> poll theta -> process -> write
            out += proc.stdout.read(chunk * 4)
        proc.stdin.close()
        proc.wait(timeout=120)
    finally:
        proc.kill()
    y_live = np.frombuffer(out, dtype="<f4")
    assert len(y_live) == 3 * chunk

    # offline reference: same chunks, same per-chunk angles, fresh state
    from beamform_tpu.config import EngineConfig, parse_array_config
    from beamform_tpu.models import get_model
    engine = EngineConfig(sample_rate=48000, window_size=hop,
                          dtype="float32")
    cfg = parse_array_config({f"mic{i}": {"id": i, "x": 0.0, "y": 0.0}
                              for i in range(ch)})
    model = get_model("das", engine, cfg, {})
    state = model.stream_init()
    outs = []
    for blk, th in zip(blocks, thetas):
        y, state = model.process_chunk(blk.T, th, state)
        outs.append(np.asarray(y, dtype=np.float32))
    y_ref = np.concatenate(outs)
    np.testing.assert_allclose(y_live, y_ref, atol=2e-7)


def test_live_drop_overrun_sheds_backlog(tmp_path):
    """--live-overrun drop: with the whole input queued up-front (worst-case
    backlog) output stays 1:1 with input and backlogged chunks are shed as
    counted drops."""
    import json
    import subprocess
    import sys

    import numpy as np

    hop, chunks = 128, 12
    rng = np.random.default_rng(0)
    x = (0.1 * rng.standard_normal((chunks * hop,))).astype("<f4")
    r = subprocess.run(
        [sys.executable, "-m", "beamform_tpu.runtime.cli", "ref",
         "--live", "--live-channels", "1", "--live-chunk", "1",
         "--window-size", str(hop), "--live-overrun", "drop"],
        input=x.tobytes(), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    y = np.frombuffer(r.stdout, dtype="<f4")
    assert y.shape == x.shape                      # 1:1 stream continuity
    rep = json.loads([l for l in r.stderr.decode().splitlines()
                      if l.startswith("{")][-1])["live"]
    assert rep["dropped_chunks"] > 0               # backlog actually shed
    assert rep["xruns"] >= rep["dropped_chunks"]
