"""Live /theta_interference side channel + theta-control precedence.

VERDICT round-2 item 4: the reference mutates the interference set at any
moment while audio flows (lcmv.cpp:258-309 — add/move/remove topic
callback); here that is `--interf-control`, a polled file of ``id:angle``
lines applied at chunk boundaries in --live/--stream, driven by the same
InterferenceMachine that powers the offline --interference-events replay.
Also covers round-2 weak 5: --theta-control now takes precedence over
--theta-timeline instead of being silently ignored.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import AIRA3, make_scene

CPU_ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}

HOP = 128


def test_machine_matches_offline_replay():
    """The incremental InterferenceMachine and the offline replay are the
    same state machine (the replay is implemented through it; this pins
    the equivalence against regressions)."""
    from beamform_tpu.runtime.timeline import (
        InterfEvent, InterferenceMachine, replay_interference_events)
    events = [
        InterfEvent(frame=3, id=2, angle=-45.0),    # add
        InterfEvent(frame=5, id=2, angle=-60.0),    # move
        InterfEvent(frame=7, id=1, angle=-58.0),    # move -> proximity remove
        InterfEvent(frame=9, id=0, angle=12.0),     # invalid id: ignored
        InterfEvent(frame=11, id=9, angle=-59.0),   # add blocked (too close)
    ]
    tl = replay_interference_events(14, [60.0], events, threshold=5.0,
                                    capacity=4)
    sm = InterferenceMachine([60.0], threshold=5.0, capacity=4)
    ei = 0
    for t in range(14):
        reset = False
        while ei < len(events) and events[ei].frame <= t:
            reset |= sm.apply(events[ei].id, events[ei].angle)
            ei += 1
        rows = sm.rows(1, reset_first=reset)
        np.testing.assert_array_equal(rows.angles[0], tl.angles[t])
        np.testing.assert_array_equal(rows.active[0], tl.active[t])
        assert rows.row0[0] == tl.row0[t]
        assert rows.reset[0] == tl.reset[t]


def _write_cfg(tmp_path):
    cfg = tmp_path / "array.yaml"
    lines = ["initial_angle: 0.0"]
    for i, (x, y) in enumerate(AIRA3):
        lines.append(f"mic{i}: {{id: {i}, x: {x}, y: {y}}}")
    lines.append("angle_interf1: 60.0")
    cfg.write_text("\n".join(lines) + "\n")
    return cfg


@pytest.mark.parametrize("node", ["lcmv", "gss"])
def test_live_interference_control_matches_offline_events(tmp_path, node):
    """Drive the live pipe with mid-stream add / move / proximity-remove
    through the control file; output must equal the offline
    --interference-events replay of the same messages (VERDICT round-2
    item 4 done-criterion)."""
    chunk_hops = 2
    chunk = chunk_hops * HOP
    fs = 48000
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    n = (x.shape[1] // chunk) * chunk
    x = np.ascontiguousarray(x[:, :n], dtype=np.float32)
    n_chunks = n // chunk

    # messages at chunk boundaries (chunks 2, 4, 6): add a second
    # interference, move it, then move #1 onto it (-> proximity removal)
    msgs = {2: "2:-45.0", 4: "2:-100.0", 6: "1:-98.0"}
    ev_spec = ",".join(f"{k * chunk / fs}:{v}"
                       for k, v in sorted(msgs.items()))

    cfg = _write_cfg(tmp_path)
    ctl = tmp_path / "interf.ctl"
    ctl.write_text("")
    params = ["--param", "past_windows=6",
              "--param", "freq_mag_threshold=0.0008",
              "--param", "interf_angle_threshold=5.0"]

    cmd = [sys.executable, "-m", "beamform_tpu.runtime.cli", node, "--live",
           "--live-channels", "3", "--window-size", str(HOP),
           "--live-chunk", str(chunk_hops), "--theta", "20",
           "--array-config", str(cfg), "--interf-control", str(ctl)] + params
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            env=CPU_ENV)
    out = b""
    try:
        for k in range(n_chunks):
            if k in msgs:
                with open(ctl, "a") as f:       # append-only message log
                    f.write(msgs[k] + "\n")
            blk = np.ascontiguousarray(x[:, k * chunk:(k + 1) * chunk].T)
            proc.stdin.write(blk.astype("<f4").tobytes())
            proc.stdin.flush()
            # synchronize on the chunk's output: the live loop is strictly
            # read -> poll controls -> process -> write
            out += proc.stdout.read(chunk * 4)
        proc.stdin.close()
        proc.wait(timeout=240)
    finally:
        proc.kill()
    y_live = np.frombuffer(out, dtype="<f4")
    assert len(y_live) == n

    # offline reference: the same messages as an --interference-events
    # replay through the offline CLI in streaming mode
    from beamform_tpu.runtime import wav as wav_io
    wav_in = str(tmp_path / "in.wav")
    wav_out = str(tmp_path / "out.wav")
    wav_io.write_wav(wav_in, x, fs, fmt="float32")
    r = subprocess.run(
        [sys.executable, "-m", "beamform_tpu.runtime.cli", node,
         "--in", wav_in, "--out", wav_out, "--window-size", str(HOP),
         "--theta", "20", "--array-config", str(cfg),
         "--stream", str(chunk_hops), "--out-format", "float32",
         "--interference-events", ev_spec] + params,
        capture_output=True, text=True, env=CPU_ENV)
    assert r.returncode == 0, r.stderr[-1500:]
    y_ref, _ = wav_io.read_wav(wav_out)
    np.testing.assert_allclose(y_live, y_ref[0][:n], atol=2e-7)


def test_theta_control_overrides_timeline(tmp_path):
    """--theta-control + --theta-timeline: the control file wins from the
    first chunk where it provides an angle (round-2 weak 5: it used to be
    silently ignored), and the CLI says so."""
    from beamform_tpu.runtime import wav as wav_io
    fs = 48000
    x = make_scene(AIRA3, seconds=0.15, hop=HOP).astype(np.float32)
    wav_in = str(tmp_path / "in.wav")
    wav_io.write_wav(wav_in, x, fs, fmt="float32")
    tl = tmp_path / "tl.json"
    tl.write_text(json.dumps([55.0] * 64))
    ctl = tmp_path / "theta.ctl"
    ctl.write_text("-30.0\n")

    def run(out_name, *extra):
        out = str(tmp_path / out_name)
        r = subprocess.run(
            [sys.executable, "-m", "beamform_tpu.runtime.cli", "das",
             "--in", wav_in, "--out", out, "--window-size", str(HOP),
             "--stream", "2", "--out-format", "float32",
             "--array-config", str(_write_cfg(tmp_path))] + list(extra),
            capture_output=True, text=True, env=CPU_ENV)
        assert r.returncode == 0, r.stderr[-1500:]
        return wav_io.read_wav(out)[0][0], r.stderr

    y_both, err = run("both.wav", "--theta-timeline", str(tl),
                      "--theta-control", str(ctl))
    y_ctl, _ = run("ctl.wav", "--theta", "-30.0")
    y_tl, _ = run("tl.wav", "--theta-timeline", str(tl))
    assert "--theta-control overrides --theta-timeline" in err
    np.testing.assert_allclose(y_both, y_ctl, atol=2e-7)
    assert np.abs(y_both - y_tl).max() > 1e-4   # and not the timeline
