"""The mega-fused MVDR/LCMV kernel matches the dense path.

kernels/mega_stream.py runs WOLA analysis, the per-frame sliding-covariance
solve and the synthesis in ONE Pallas program (the TPU float32 production
strategy selected by solver='auto' when the band fits on-core); here it runs
in interpret mode on the CPU mesh against the dense block pipeline on the
same float32 inputs. Agreement is at f32 round-off (different summation /
solve order — refinement is off in the fused kernel, see the kernel
docstring's measured deviation budget); the bit-level parity contract vs the
float64 oracle lives on the dense path (tests/test_parity.py).

Reference semantics: mvdr.cpp:62-115, lcmv.cpp:108-138.
"""

import numpy as np
import pytest

from beamform_tpu.config import EngineConfig
from beamform_tpu.models import get_model

from conftest import AIRA3, make_scene

HOP = 128

BASE = dict(past_windows=6, freq_mag_threshold=0.0008, freq_max=16000.0,
            freq_min=100.0)


def cfg3():
    from beamform_tpu.config import parse_array_config
    return parse_array_config({f"mic{i}": {"id": i, "x": x, "y": y}
                               for i, (x, y) in enumerate(AIRA3)})


@pytest.mark.parametrize("name", ["mvdr", "lcmv"])
def test_mega_equals_dense(name):
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)

    dense = get_model(name, engine, cfg3(), dict(BASE, solver="dense"))
    mega = get_model(name, engine, cfg3(), dict(BASE, solver="mega"))
    y_d = np.asarray(dense.process(x, 20.0))
    y_m = np.asarray(mega.process(x, 20.0))
    scale = max(np.abs(y_d).max(), 1e-12)
    assert np.abs(y_m - y_d).max() / scale < 2e-4, (
        np.abs(y_m - y_d).max() / scale)


def test_mega_streaming_equals_offline():
    """Chunked mega output matches one-shot: the kernel carries the WOLA
    tail hop, the OLA half-frame and the W-frame covariance ring across
    chunk boundaries."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    model = get_model("mvdr", engine, cfg3(), dict(BASE, solver="mega"))
    y_off = np.asarray(model.process(x, 20.0))

    n = x.shape[-1] // HOP * HOP
    x = x[:, :n]
    state = model.stream_init()
    outs = []
    chunk = 4 * HOP
    for i in range(0, n, chunk):
        y, state = model.process_chunk(x[:, i:i + chunk], 20.0, state)
        outs.append(np.asarray(y))
    y_chunks = np.concatenate(outs)
    scale = max(np.abs(y_off).max(), 1e-12)
    assert np.abs(y_chunks - y_off[:len(y_chunks)]).max() / scale < 2e-4


def test_mega_segmented_equals_single_launch(monkeypatch):
    """Long streams chain multiple pallas launches (kernels/mega_stream.py
    SEG_FRAMES) with ring/OLA carries between segments; forcing tiny
    segments must reproduce the single-launch output (the warm-up replay
    rebuilds the covariance epoch-exactly)."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    model = get_model("mvdr", engine, cfg3(), dict(BASE, solver="mega"))
    y_one = np.asarray(model.process(x, 20.0))

    monkeypatch.setenv("BEAMFORM_MEGA_SEG", "8")
    seg_model = get_model("mvdr", engine, cfg3(), dict(BASE, solver="mega"))
    y_seg = np.asarray(seg_model.process(x, 20.0))
    scale = max(np.abs(y_one).max(), 1e-12)
    assert np.abs(y_seg - y_one).max() / scale < 2e-5, (
        np.abs(y_seg - y_one).max() / scale)


def test_mega_rejects_float64():
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    model = get_model("mvdr", engine, cfg3(), dict(BASE, solver="mega"))
    x = make_scene(AIRA3, seconds=0.1, quiet_hops=2, hop=HOP)
    with pytest.raises(ValueError, match="float32"):
        model.process(x, 20.0)


def test_forced_mega_beyond_capacity_raises():
    """solver='mega' past the fused kernel's on-core limits must fail
    loudly at strategy-selection time, not at trace/compile."""
    from beamform_tpu.config import parse_array_config
    ang = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    big_cfg = parse_array_config(
        {f"mic{i}": {"id": i, "x": 0.05 * np.cos(a), "y": 0.05 * np.sin(a)}
         for i, a in enumerate(ang)})
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    for name in ("mvdr", "lcmv"):
        model = get_model(name, engine, big_cfg, dict(BASE, solver="mega"))
        with pytest.raises(ValueError, match="capacity"):
            model._strategy()


def test_mega_lcmv_with_interference_timeline():
    """Constraint slots (add/remove via the masked timeline) flow through
    the fused kernel's pre-gathered per-frame control planes and match the
    dense path."""
    from beamform_tpu.runtime.timeline import (
        InterfEvent, replay_interference_events)
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    n = x.shape[-1] // HOP * HOP + HOP
    t = n // HOP
    tl = replay_interference_events(
        t, [60.0], [InterfEvent(frame=6, id=1, angle=-45.0),
                    InterfEvent(frame=12, id=1, angle=-50.0)],
        capacity=3)

    dense = get_model("lcmv", engine, cfg3(), dict(BASE, solver="dense"))
    mega = get_model("lcmv", engine, cfg3(), dict(BASE, solver="mega"))
    y_d = np.asarray(dense.process(x, 20.0, interference=tl))
    y_m = np.asarray(mega.process(x, 20.0, interference=tl))
    scale = max(np.abs(y_d).max(), 1e-12)
    # see test_stream_solver.py: M=3 with 3 constraints is a determined,
    # ill-conditioned system; f32 algorithms legitimately differ at ~3e-4
    assert np.abs(y_m - y_d).max() / scale < 1e-3


def test_mega_rejects_nyquist_band():
    """The half-spectrum synthesis doubles every bin 0 < k < nfft/2; a
    band reaching the Nyquist bin (or its extended shadow) would be
    double-counted (measured 0.396 relative error before the guard), so
    mega_fits must exclude it and forcing solver='mega' must raise."""
    from beamform_tpu.kernels.mega_stream import mega_fits
    assert not mega_fits(3, np.array([1, 128]), 256)         # 128 = nfft/2
    assert mega_fits(3, np.array([1, 127]), 256)

    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    model = get_model("mvdr", engine, cfg3(),
                      dict(BASE, freq_max=24000.0, solver="mega"))
    with pytest.raises(ValueError, match="capacity"):
        model._strategy()
    # and auto quietly routes such bands off the mega path
    auto = get_model("mvdr", engine, cfg3(), dict(BASE, freq_max=24000.0))
    assert auto._strategy() != "mega"


def test_mega_capacity_scales_with_past_windows():
    """The W-frame spectra ring + hist/ring blocks scale the VMEM budget:
    the strategy must see the configured past_windows, not a fixed cap."""
    from beamform_tpu.kernels.mega_stream import mega_fits
    ib = np.arange(5, 683)                     # the 16-ch launch band
    assert mega_fits(16, ib, 2048, w_hist=10)
    assert not mega_fits(16, ib, 2048, w_hist=48)

    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    model = get_model("mvdr", engine, cfg3(),
                      dict(BASE, past_windows=2048, solver="mega"))
    with pytest.raises(ValueError, match="capacity"):
        model._strategy()


@pytest.mark.parametrize("group", ["2", "4"])
def test_mega_solve_group_invariance(monkeypatch, group):
    """Lane-grouped solves (BEAMFORM_MEGA_GROUP) are BIT-identical to the
    per-frame chain: every factor/solve op is elementwise over lanes, so
    concatenating G frames' covariances on the lane axis changes the serial
    op count, not any lane's arithmetic. The default (SOLVE_GROUP=1, the
    measured winner — see the disproof note in kernels/mega_stream.py) is
    covered by every other mega test; here groups 2 and 4 must reproduce
    it exactly."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    x = make_scene(AIRA3, seconds=0.2, quiet_hops=8, hop=HOP)
    model = get_model("mvdr", engine, cfg3(), dict(BASE, solver="mega"))
    y_default = np.asarray(model.process(x, 20.0))

    monkeypatch.setenv("BEAMFORM_MEGA_GROUP", group)
    model2 = get_model("mvdr", engine, cfg3(), dict(BASE, solver="mega"))
    y_g = np.asarray(model2.process(x, 20.0))
    np.testing.assert_array_equal(y_g, y_default)
