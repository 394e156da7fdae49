"""The mega-fused GSS kernel matches the scan path.

kernels/gss_stream.py runs WOLA analysis, the per-frame natural-gradient
demixing update (gss.cpp:96-156) and the synthesis in ONE Pallas program
(the TPU float32 production strategy selected by solver='auto' when the
band fits on-core); here it runs in interpret mode on the CPU mesh against
the lax.scan formulation on the same float32 inputs. Agreement is at f32
round-off (different summation order in the update algebra); the bit-level
parity contract vs the float64 oracle lives on the scan path
(tests/test_parity.py).
"""

import numpy as np
import pytest

from beamform_tpu.config import EngineConfig, parse_array_config
from beamform_tpu.models import get_model

from conftest import AIRA3, make_scene

HOP = 128

BASE = dict(freq_mag_threshold=0.0008, freq_max=16000.0, freq_min=100.0,
            mu=0.01, out_amp=1.0)

TOL = 5e-5


def cfg3(interf=()):
    doc = {f"mic{i}": {"id": i, "x": x, "y": y}
           for i, (x, y) in enumerate(AIRA3)}
    for k, a in enumerate(interf):
        doc[f"angle_interf{k + 1}"] = a
    return parse_array_config(doc)


def engine32():
    return EngineConfig(sample_rate=48000, window_size=HOP, dtype="float32")


def test_gss_mega_equals_scan():
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    scan = get_model("gss", engine32(), cfg3(), dict(BASE, solver="scan"))
    mega = get_model("gss", engine32(), cfg3(), dict(BASE, solver="mega"))
    y_s = np.asarray(scan.process(x, 20.0))
    y_m = np.asarray(mega.process(x, 20.0))
    scale = max(np.abs(y_s).max(), 1e-12)
    assert np.abs(y_m - y_s).max() / scale < TOL


def test_gss_mega_interference_slots():
    """Masked fixed-capacity source slots: inactive W rows stay zero under
    the in-kernel update and the active count drives the gradient
    constants (gss.cpp:132-133 uses interference_angles.size()+1)."""
    cfg = cfg3(interf=(-40.0, 60.0))
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    scan = get_model("gss", engine32(), cfg, dict(BASE, solver="scan"))
    mega = get_model("gss", engine32(), cfg, dict(BASE, solver="mega"))
    y_s = np.asarray(scan.process(x, 20.0))
    y_m = np.asarray(mega.process(x, 20.0))
    scale = max(np.abs(y_s).max(), 1e-12)
    assert np.abs(y_m - y_s).max() / scale < TOL


def test_gss_mega_theta_change_resets_w():
    """A theta change resets W to A^H (update_weights, gss.cpp:90-93) —
    exercised through the kernel's per-frame reset stream."""
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    t = x.shape[-1] // HOP
    th = np.full(t, 20.0)
    th[t // 2:] = -35.0
    scan = get_model("gss", engine32(), cfg3(), dict(BASE, solver="scan"))
    mega = get_model("gss", engine32(), cfg3(), dict(BASE, solver="mega"))
    y_s = np.asarray(scan.process(x, th))
    y_m = np.asarray(mega.process(x, th))
    scale = max(np.abs(y_s).max(), 1e-12)
    assert np.abs(y_m - y_s).max() / scale < TOL


def test_gss_mega_streaming_equals_offline():
    """Chunked mega output matches one-shot: the kernel carries the WOLA
    tail hop, the OLA half-frame, the demixing planes and prev_theta
    across chunk boundaries."""
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    model = get_model("gss", engine32(), cfg3(), dict(BASE, solver="mega"))
    y_off = np.asarray(model.process(x, 20.0))
    n = x.shape[-1] // HOP * HOP
    x = x[:, :n]
    state = model.stream_init()
    outs = []
    for i in range(0, n, 4 * HOP):
        y, state = model.process_chunk(x[:, i:i + 4 * HOP], 20.0, state)
        outs.append(np.asarray(y))
    y_chunks = np.concatenate(outs)
    scale = max(np.abs(y_off).max(), 1e-12)
    assert np.abs(y_chunks - y_off[:len(y_chunks)]).max() / scale < 1e-5


def test_gss_mega_event_timeline():
    """Interference add/move events flow through the pre-gathered
    per-frame control planes and the reset stream (the reference's
    interf_theta_roscallback protocol, gss.cpp:288-339)."""
    from beamform_tpu.runtime.timeline import (
        InterfEvent, replay_interference_events)
    cfg = cfg3(interf=(-40.0,))
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    n = x.shape[-1] // HOP * HOP
    x = x[:, :n]
    t = n // HOP
    tl = replay_interference_events(
        t, [-40.0], [InterfEvent(frame=t // 3, id=2, angle=55.0),
                     InterfEvent(frame=2 * t // 3, id=1, angle=54.0)],
        capacity=2)
    scan = get_model("gss", engine32(), cfg, dict(BASE, solver="scan"))
    mega = get_model("gss", engine32(), cfg, dict(BASE, solver="mega"))
    y_s = np.asarray(scan.process(x, 20.0, interference=tl))
    y_m = np.asarray(mega.process(x, 20.0, interference=tl))
    scale = max(np.abs(y_s).max(), 1e-12)
    assert np.abs(y_m - y_s).max() / scale < TOL


def test_gss_mega_segmented_equals_single_launch(monkeypatch):
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    model = get_model("gss", engine32(), cfg3(), dict(BASE, solver="mega"))
    y_one = np.asarray(model.process(x, 20.0))
    monkeypatch.setenv("BEAMFORM_MEGA_SEG", "8")
    seg = get_model("gss", engine32(), cfg3(), dict(BASE, solver="mega"))
    y_seg = np.asarray(seg.process(x, 20.0))
    scale = max(np.abs(y_one).max(), 1e-12)
    assert np.abs(y_seg - y_one).max() / scale < 1e-5


def test_gss_mega_rejects_float64():
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    model = get_model("gss", engine, cfg3(), dict(BASE, solver="mega"))
    x = make_scene(AIRA3, seconds=0.1, quiet_hops=2, hop=HOP)
    with pytest.raises(ValueError, match="float32"):
        model.process(x, 20.0)


def test_gss_mega_capacity_gates():
    """gss_fits: bands touching bin 0 (no DC special case in gss — the
    half-spectrum fold needs y[0] real) or the Nyquist bin are excluded,
    and forcing solver='mega' there must raise at strategy time."""
    from beamform_tpu.kernels.gss_stream import gss_fits
    assert gss_fits(3, np.arange(1, 128), 256, 1)
    assert not gss_fits(3, np.arange(0, 128), 256, 1)     # bin 0 in band
    assert not gss_fits(3, np.array([1, 128]), 256, 1)    # Nyquist in band
    assert gss_fits(16, np.arange(5, 683), 2048, 3)       # the launch shape

    model = get_model("gss", engine32(), cfg3(),
                      dict(BASE, freq_min=0.0, solver="mega"))
    with pytest.raises(ValueError, match="capacity"):
        model._strategy(1)
    auto = get_model("gss", engine32(), cfg3(), dict(BASE, freq_min=0.0))
    assert auto._strategy(1) != "mega"
