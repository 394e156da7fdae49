"""Runtime-health counters (the xrun-equivalent) and session monitoring."""

import numpy as np

from beamform_tpu.config import EngineConfig, parse_array_config
from beamform_tpu.models import get_model
from beamform_tpu.runtime.streaming import StreamingSession
from beamform_tpu.utils.profiling import RealTimeMonitor

from conftest import AIRA3


def test_monitor_counts_xruns(tmp_path):
    mon = RealTimeMonitor(sample_rate=48000)
    mon.start_chunk()
    mon.end_chunk(48000)          # 1 s of audio processed quickly: no xrun
    mon.start_chunk()
    import time
    time.sleep(0.01)
    mon.end_chunk(48)             # 1 ms of audio in 10 ms: xrun
    assert mon.xruns == 1 and mon.chunks == 2
    rep = mon.report()
    assert rep["xruns"] == 1 and rep["audio_seconds"] > 1.0
    p = str(tmp_path / "xruns.txt")
    mon.write_xrun_count(p)
    assert open(p).read().strip() == "1"


def test_session_with_monitor():
    doc = {f"mic{i}": {"id": i, "x": x, "y": y}
           for i, (x, y) in enumerate(AIRA3)}
    cfg = parse_array_config(doc)
    engine = EngineConfig(sample_rate=48000, window_size=128,
                          dtype="float64")
    sess = StreamingSession(get_model("das", engine, cfg), monitor=True)
    rng = np.random.default_rng(0)
    for _ in range(3):
        sess.process(0.1 * rng.standard_normal((3, 4 * 128)), 0.0)
    rep = sess.monitor.report()
    assert rep["chunks"] == 3
    assert rep["audio_seconds"] > 0
