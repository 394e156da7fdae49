"""Interference timeline: event protocol semantics + masked constraint
equivalence in LCMV/GSS."""

import numpy as np

from beamform_tpu.config import EngineConfig, LcmvParams, GssParams
from beamform_tpu.geometry import ArrayGeometry
from beamform_tpu.models.lcmv import LcmvModel
from beamform_tpu.models.gss import GssModel
from beamform_tpu.runtime.timeline import (
    InterfEvent, InterferenceTimeline, replay_interference_events,
    static_interference)

from conftest import AIRA3, make_scene

HOP = 128
FS = 48000


def engine():
    return EngineConfig(sample_rate=FS, window_size=HOP, dtype="float64")


def test_event_protocol_semantics():
    """lcmv.cpp:258-309: move, proximity-removal, add, proximity-reject."""
    ev = [
        InterfEvent(frame=2, id=1, angle=50.0),    # move slot 1
        InterfEvent(frame=4, id=3, angle=-90.0),   # add (id > K)
        InterfEvent(frame=6, id=5, angle=-88.0),   # add rejected (< 5 deg)
        InterfEvent(frame=8, id=1, angle=-33.0),   # move near slot 2 -> del
    ]
    tl = replay_interference_events(10, [40.0, -30.0], ev, threshold=5.0,
                                    capacity=4)
    # t=0..1: initial set
    assert tl.active[0].tolist() == [True, True, False, False]
    np.testing.assert_allclose(tl.angles[0, :2], [40.0, -30.0])
    assert tl.row0[0] == 1.0 and not tl.reset[0]
    # t=2: moved slot 1 (no structural change -> row0 stays 1)
    np.testing.assert_allclose(tl.angles[2, :2], [50.0, -30.0])
    assert tl.row0[2] == 1.0 and tl.reset[2]
    # t=4: added third interference -> row0 quirk kicks in
    assert tl.active[4].tolist() == [True, True, True, False]
    assert tl.angles[4, 2] == -90.0
    assert tl.row0[4] == 0.0
    # t=6: add rejected (within 5 deg of -90)
    assert tl.active[6].tolist() == [True, True, True, False]
    # t=8: slot 1 moved to -33, within 5 deg of slot 2 (-30) -> removed
    assert tl.active[8].tolist() == [True, True, False, False]
    np.testing.assert_allclose(tl.angles[8, :2], [-30.0, -90.0])


def test_row0_quirk_switchable():
    ev = [InterfEvent(frame=1, id=2, angle=90.0)]
    tl = replay_interference_events(3, [0.0], ev,
                                    bug_row0_zero_after_realloc=False)
    assert tl.row0[2] == 1.0


def _scene():
    return make_scene(AIRA3, seconds=0.15, theta_deg=25.0, hop=HOP, seed=7,
                      quiet_hops=6)


def test_lcmv_masked_capacity_equals_exact():
    """A fixed-capacity timeline with inactive slots must give exactly the
    static-constraint result (the masked-identity solve is exact)."""
    x = _scene()
    t = x.shape[1] // HOP
    p = LcmvParams(past_windows=4, freq_mag_threshold=0.0008,
                   freq_max=16000.0, freq_min=100.0, out_amp=1.0)
    geom = ArrayGeometry.from_xy(AIRA3)
    exact = LcmvModel(engine(), geom, p, interference_angles=(60.0,))
    y_exact = np.asarray(exact.process(x, 25.0))

    padded = LcmvModel(engine(), geom, p, interference_angles=())
    tl = static_interference(t, [60.0], capacity=5)  # 4 inactive slots
    y_masked = np.asarray(padded.process(x, 25.0, interference=tl))
    np.testing.assert_allclose(y_masked, y_exact, atol=1e-9)


def test_gss_masked_capacity_equals_exact():
    x = _scene()
    t = x.shape[1] // HOP
    p = GssParams(freq_mag_threshold=0.0008, freq_max=16000.0,
                  freq_min=100.0, out_amp=0.1, mu=0.001)
    geom = ArrayGeometry.from_xy(AIRA3)
    exact = GssModel(engine(), geom, p, interference_angles=(60.0,))
    y_exact = np.asarray(exact.process(x, 25.0))

    padded = GssModel(engine(), geom, p, interference_angles=())
    tl = static_interference(t, [60.0], capacity=4)
    y_masked = np.asarray(padded.process(x, 25.0, interference=tl))
    np.testing.assert_allclose(y_masked, y_exact, atol=1e-9)


def test_lcmv_dynamic_event_runs_and_changes_output():
    """A mid-stream interference add changes the output after the event and
    engages the row0 quirk."""
    x = _scene()
    t = x.shape[1] // HOP
    p = LcmvParams(past_windows=4, freq_mag_threshold=0.0008,
                   freq_max=16000.0, freq_min=100.0, out_amp=1.0)
    geom = ArrayGeometry.from_xy(AIRA3)
    model = LcmvModel(engine(), geom, p, interference_angles=())

    # NB: with M mics the post-realloc row0 quirk caps the usable constraint
    # count at M-1 (the zeroed mic0 row drops the Gram rank; the reference's
    # Eigen inverse produces garbage beyond that, as does ours). Use S=2.
    tl_static = static_interference(t, [], capacity=3)
    ev = [InterfEvent(frame=t // 2, id=1, angle=-70.0)]
    tl_dyn = replay_interference_events(t, [], ev, capacity=3)
    y_s = np.asarray(model.process(x, 25.0, interference=tl_static))
    y_d = np.asarray(model.process(x, 25.0, interference=tl_dyn))
    half = (t // 2) * HOP
    np.testing.assert_allclose(y_d[:half], y_s[:half], atol=1e-9)
    assert np.max(np.abs(y_d[half + HOP:] - y_s[half + HOP:])) > 1e-6
    assert np.isfinite(y_d).all()


def test_lcmv_event_parity_vs_oracle():
    """Dynamic interference events, end to end against the transliterated
    oracle: add and remove interferences mid-stream, with the realloc row0
    quirk engaged."""
    from beamform_tpu.oracle import nodes as on
    # 4 mics: with the row0 quirk the usable constraint rank is M-1 = 3, so
    # the transient 2-interferer phase (S=3) stays nonsingular
    XY = AIRA3 + [(0.12, 0.07)]
    hop, fs, theta = HOP, FS, 25.0
    x = make_scene(XY, seconds=0.3, theta_deg=theta, hop=hop, seed=9,
                   quiet_hops=8)
    t = x.shape[1] // hop
    p = dict(past_windows=5, freq_mag_threshold=0.0008, freq_max=16000.0,
             freq_min=100.0, out_amp=1.0)
    thr = 5.0

    # events: add one interferer at frame t1; move it near... then remove
    # by moving a second one close (the proximity-removal path)
    t1, t2, t3 = t // 4, t // 2, 3 * t // 4
    from beamform_tpu.runtime.timeline import (
        InterfEvent, replay_interference_events)
    events = [InterfEvent(t1, 1, 60.0),      # add (id > K=0)
              InterfEvent(t2, 2, -80.0),     # add second
              InterfEvent(t3, 2, 57.0)]      # move #2 near #1 -> #2 removed
    tl = replay_interference_events(t, [], events, threshold=thr,
                                    capacity=4)

    model = LcmvModel(engine(), ArrayGeometry.from_xy(XY), LcmvParams(**p),
                      interference_angles=())
    y = np.asarray(model.process(x, theta, interference=tl))

    o = on.LcmvOracle(XY, hop, fs, theta, interference_angles=(), **p)
    outs = []
    for k in range(t):
        for e in events:
            if e.frame == k:
                o.interf_event(e.id, e.angle, threshold=thr)
        outs.append(o.callback(x[:, k * hop:(k + 1) * hop]))
    ref = np.concatenate(outs)
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y, ref, atol=1e-7)


def test_gss_event_parity_vs_oracle():
    """Dynamic interference events through GSS: accepted events reset the
    demixing matrices to A^H with the row0 quirk; validated against the
    transliterated oracle."""
    from beamform_tpu.oracle import nodes as on
    XY = AIRA3 + [(0.12, 0.07)]
    hop, fs, theta = HOP, FS, 25.0
    x = make_scene(XY, seconds=0.3, theta_deg=theta, hop=hop, seed=11)
    t = x.shape[1] // hop
    p = dict(freq_mag_threshold=0.0008, freq_max=16000.0, freq_min=100.0,
             out_amp=0.1, mu=0.001)
    thr = 5.0
    t1, t2 = t // 3, 2 * t // 3
    from beamform_tpu.runtime.timeline import (
        InterfEvent, replay_interference_events)
    events = [InterfEvent(t1, 1, 60.0),      # add
              InterfEvent(t2, 1, -40.0)]     # move (no structural change)
    tl = replay_interference_events(t, [], events, threshold=thr,
                                    capacity=3)
    model = GssModel(engine(), ArrayGeometry.from_xy(XY), GssParams(**p),
                     interference_angles=())
    y = np.asarray(model.process(x, theta, interference=tl))

    o = on.GssOracle(XY, hop, fs, theta, interference_angles=(), **p)
    outs = []
    for k in range(t):
        for e in events:
            if e.frame == k:
                o.interf_event(e.id, e.angle, threshold=thr)
        outs.append(o.callback(x[:, k * hop:(k + 1) * hop]))
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y, np.concatenate(outs), atol=1e-7)
