"""Two-process live composition: beamformer process + DOA refiner process.

The reference composes its closed loop as separate ROS nodes over TCPROS
(launch/das.launch runs the `das` node; scripts/energy2theta.py runs beside
it, subscribes to the beamformer's `jackaudio` topic and publishes `/theta`
back — das.cpp:109). This example is the same dataflow graph as two OS
processes speaking the framework's live transports:

    scene PCM --pipe--> [beamform-tpu das --live --theta-control F]
                              |  beamformed mono PCM (the jackaudio topic)
                              v
                        [this file --role doa]
                              |  appends refined theta lines (the /theta
                              v  topic) to F, polled per chunk by process A
                              F

Process A is the stock CLI (runtime/cli.py run_live: raw interleaved
float32 PCM in, mono float32 out, `--theta-control` polled at chunk
boundaries — the /theta subscription). Process B feeds every hop-sized
output window to the faithful `GradientDoa` controller
(scripts/energy2theta.py transliteration) and appends each update to the
control file. The energy objective peaks at the true DOA (measured: DAS
output rms 0.30 at the 20° target vs 0.11-0.17 elsewhere on this array),
so theta climbs from its wrong initial value onto the target while the
audio is flowing — the DOA process demonstrably steers the beamformer
process, with no shared memory and no in-process shortcut.

Run: ``python examples/two_process_doa.py`` (hermetic, CPU, ~2 min).
"""

import argparse
import json
import os
import subprocess
import sys
import threading

import numpy as np

FS = 48000
HOP = 256
SECONDS = 10.0
TARGET = 20.0          # true source DOA
THETA0 = 10.0          # beamformer's (wrong) initial steering
MU = 100.0
NUM_WIN = 20


def doa_role(args) -> int:
    """Process B: beamformed mono PCM on stdin -> /theta lines to the
    control file, one GradientDoa step per hop window."""
    from beamform_tpu.doa import GradientDoa

    doa = GradientDoa(theta=args.theta0, mu=args.mu, num_win=args.num_win,
                      vad_threshold=0.0, energy_mode="rms")
    stdin = sys.stdin.buffer
    win_bytes = 4 * args.hop
    pending = b""
    updates = 0
    last = doa.theta
    while True:
        d = stdin.read(win_bytes - len(pending))
        if not d:
            break
        pending += d
        if len(pending) < win_bytes:
            continue
        w = np.frombuffer(pending, dtype="<f4")
        pending = b""
        theta = doa.step(w)
        if theta != last:
            # append-only theta log: process A's _poll_theta reads the
            # last non-empty line per chunk (the /theta topic semantics)
            with open(args.control, "a") as f:
                f.write(f"{theta:.4f}\n")
            last = theta
            updates += 1
    print(json.dumps({"theta0": args.theta0,
                      "theta_final": round(float(doa.theta), 2),
                      "updates": updates}))
    return 0


def synth_scene_pcm(seconds: float, seed: int = 0):
    """One band-limited source at TARGET hitting the 16-mic AIRA array
    with exact spectral delays; returns interleaved float32 PCM bytes."""
    import beamform_tpu
    from beamform_tpu.config import load_array_config
    from beamform_tpu.evaluation import synth_scene
    from beamform_tpu.geometry import ArrayGeometry

    cfg_path = os.path.join(beamform_tpu.__path__[0], "configs",
                            "aira16.yaml")
    geom = ArrayGeometry.from_config(load_array_config(cfg_path))
    rng = np.random.default_rng(seed)
    n = int(seconds * FS) // HOP * HOP
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1.0 / FS)
    spec *= (f > 200) & (f < 6000)
    src = np.fft.irfft(spec, n=n)
    src = 0.3 * src / np.std(src)
    scene = synth_scene(geom, [src], [TARGET], FS, noise_std=0.002,
                        delay="spectral")
    pcm = scene.mixture.T.astype("<f4").tobytes()   # frame-major interleave
    return cfg_path, geom.num_mics, pcm


def driver(args) -> int:
    """Spawn A (beamformer CLI) and B (DOA refiner), pipe A's output into
    B, feed the scene into A, report the steering trajectory."""
    control = args.control or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"theta_ctl_{os.getpid()}.txt")
    if os.path.exists(control):
        os.unlink(control)
    cfg_path, mics, pcm = synth_scene_pcm(args.seconds)

    env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
        "BEAMFORM_EXAMPLE_PLATFORM", "cpu"))
    a = subprocess.Popen(
        [sys.executable, "-m", "beamform_tpu.runtime.cli", "das",
         "--live", "--live-channels", str(mics), "--window-size", str(HOP),
         "--array-config", cfg_path, "--theta", str(THETA0),
         "--theta-control", control],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, env=env)
    b = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--role", "doa",
         "--control", control, "--hop", str(HOP), "--theta0", str(THETA0),
         "--mu", str(MU), "--num-win", str(NUM_WIN)],
        stdin=a.stdout, stdout=subprocess.PIPE, env=env)
    a.stdout.close()               # B owns the read end now

    def feed():
        step = 4 * HOP * 4 * mics  # one live chunk of interleaved frames
        try:
            for i in range(0, len(pcm), step):
                a.stdin.write(pcm[i:i + step])
            a.stdin.close()
        except BrokenPipeError:
            pass

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    out_b, _ = b.communicate(timeout=args.timeout)
    a.wait(timeout=30)
    t.join(timeout=10)
    rep = json.loads(out_b.decode().strip().splitlines()[-1])
    with open(control) as f:
        timeline = [float(x) for x in f.read().split()]
    rep["target"] = TARGET
    rep["control_lines"] = len(timeline)
    print(json.dumps(rep))
    err = (abs(rep["theta_final"] - TARGET), abs(THETA0 - TARGET))
    print(f"steered {THETA0:+.0f}° -> {rep['theta_final']:+.1f}° "
          f"(target {TARGET:+.0f}°): |error| {err[1]:.0f}° -> "
          f"{err[0]:.1f}° over {rep['updates']} /theta updates")
    return 0 if err[0] < err[1] else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=("driver", "doa"), default="driver")
    ap.add_argument("--control", default=None)
    ap.add_argument("--hop", type=int, default=HOP)
    ap.add_argument("--theta0", type=float, default=THETA0)
    ap.add_argument("--mu", type=float, default=MU)
    ap.add_argument("--num-win", type=int, default=NUM_WIN)
    ap.add_argument("--seconds", type=float, default=SECONDS)
    ap.add_argument("--timeout", type=float, default=900.0)
    args = ap.parse_args(argv)
    if args.role == "doa":
        if not args.control:
            print("--role doa needs --control", file=sys.stderr)
            return 2
        return doa_role(args)
    return driver(args)


if __name__ == "__main__":
    sys.exit(main())
