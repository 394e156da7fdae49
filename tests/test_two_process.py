"""Two-process live composition (VERDICT round-4 item 6): the beamformer
CLI and the DOA refiner as separate OS processes, coupled only by a PCM
pipe (the jackaudio topic) and the --theta-control file (the /theta
topic) — the framework's equivalent of launch/das.launch running the das
node beside scripts/energy2theta.py.

The assertion is the steering loop actually closing: the DOA process must
move the beamformer's theta from its wrong initial value (+10°) clearly
toward the true source DOA (+20°), through the file channel, while audio
flows through the pipe."""

import json
import os
import subprocess
import sys

EXAMPLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "two_process_doa.py")


def test_two_process_doa_steers_beamformer(tmp_path):
    control = str(tmp_path / "theta_ctl.txt")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, EXAMPLE, "--seconds", "6",
         "--control", control],
        capture_output=True, timeout=560, env=env)
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    rep = json.loads(out.stdout.decode().strip().splitlines()[0])
    # the DOA process pushed theta through the control file...
    assert rep["updates"] > 100, rep
    assert os.path.exists(control)
    # ...and demonstrably steered the beamformer onto the source:
    # |error| must at least halve (measured: 10° -> ~2°)
    assert abs(rep["theta_final"] - rep["target"]) < 5.0, rep
