"""DOA/VAD helper layer: state machines, gradient controllers, closed loop."""

import numpy as np

from beamform_tpu.config import EngineConfig
from beamform_tpu.doa import (
    EnergyVad, GradientDoa, DiffGradientDoa, SirToTheta, SirDummy)
from beamform_tpu.doa.closed_loop import run_closed_loop
from beamform_tpu.doa.sir2theta import SpeakerIdStub
from beamform_tpu.models import get_model
from beamform_tpu.runtime.streaming import StreamingSession

from conftest import AIRA3, make_scene

HOP = 128


def test_vad_detects_activity():
    vad = EnergyVad()
    rng = np.random.default_rng(0)
    quiet = 0.001 * rng.standard_normal(20 * HOP)
    loud = 0.5 * rng.standard_normal(20 * HOP)
    stream = np.concatenate([quiet, loud, quiet])
    flags = vad.run(stream, HOP)
    assert flags[25:38].mean() > 0.5     # active during the loud section
    assert flags[:18].mean() < 0.2       # mostly silent before


def test_sir_dummy_convergence():
    """The reference's only closed-loop mock: with SIR = -theta^2 the
    controller walks theta toward 0 (SIRdummy.py:10-12)."""
    ctrl = SirToTheta(theta=1.0, mu=0.01)
    dummy = SirDummy()
    th = ctrl.theta
    for _ in range(300):
        th = ctrl.step(dummy.measure(th))
    assert abs(th) < abs(1.0)
    assert np.isfinite(th)


def test_gradient_doa_moves_and_wraps():
    doa = GradientDoa(theta=179.0, mu=500.0, num_win=3, vad_threshold=0.0,
                      energy_mode="rms")
    rng = np.random.default_rng(1)
    # increasing energy windows push theta up (ascent) and wrap past 180
    # (the reference wraps ONCE, energy2theta.py:88-91)
    for scale in (0.1, 0.1, 0.1, 0.2, 0.4):
        doa.step(scale * rng.standard_normal(HOP))
    assert doa.theta != 179.0
    assert doa.theta < 179.0  # wrapped through +180 to the negative side


def test_diff_gradient_doa_runs():
    doa = DiffGradientDoa(theta=10.0, mu=5.0, num_win=4, vad_threshold=0.0)
    rng = np.random.default_rng(2)
    b = 0.1 * rng.standard_normal(12 * HOP)
    r = 0.1 * rng.standard_normal(12 * HOP)
    th = doa.run(b, r, HOP)
    assert th.shape == (12,)
    assert np.all(np.abs(th) <= 180.0)


def test_spec_gradient_doa_history_objective():
    """History mode: E = rms_last / ((rms_last - mean(rms)) * alpha)
    (energy2theta-spec.py:78-92); theta moves with '+' sign despite the
    reference's 'descent' comment (energy2theta-spec.py:138)."""
    from beamform_tpu.doa import SpecGradientDoa
    doa = SpecGradientDoa(theta=5.0, num_win=4, vad_threshold=0.0)
    assert doa.mu == 10.0
    rng = np.random.default_rng(3)
    b = np.zeros(10 * HOP)
    r = 0.1 * rng.standard_normal(10 * HOP)
    th = doa.run(b, r, HOP)
    assert th.shape == (10,)
    assert np.all(th[:4] == 5.0)            # deque fill phase, no updates
    assert np.any(th[4:] != 5.0)            # then the controller moves
    assert np.all(np.abs(th[np.isfinite(th)]) <= 180.0)

    # hand-check one energy: build the same 4-deep deque state
    wins = [r[i * HOP:(i + 1) * HOP] - b[i * HOP:(i + 1) * HOP]
            for i in range(1, 5)]
    past = np.array([np.sqrt(np.mean(w ** 2)) for w in wins])
    expect = past[-1] / ((past[-1] - past.mean()) * 1000.0)
    probe = SpecGradientDoa(num_win=4, vad_threshold=0.0)
    for w in wins:
        probe._windows.append(w)
    assert np.isclose(probe._deque_energy(), expect)


def test_spec_gradient_doa_spectrogram_objective():
    """Spectrogram mode: scipy spectrogram, thresholded-bin mean, sqrt
    (energy2theta-spec.py:55-77); all-below-threshold -> NaN -> -100
    invalid, update skipped (energy2theta-spec.py:98-103,137)."""
    from beamform_tpu.doa import SpecGradientDoa
    doa = SpecGradientDoa(theta=0.0, num_win=3, vad_threshold=0.0,
                          energy_calc_method="spectrogram")
    assert doa.mu == 5000.0
    rng = np.random.default_rng(4)
    b = np.zeros(9 * 1024)
    r = 0.05 * rng.standard_normal(9 * 1024)
    th = doa.run(b, r, 1024)
    assert np.all(np.isfinite(th)) and np.any(th != 0.0)

    # every bin under fft_threshold: energy invalid, theta frozen
    tiny = SpecGradientDoa(theta=7.0, num_win=3, vad_threshold=0.0,
                           energy_calc_method="spectrogram",
                           fft_threshold=1e30)
    th2 = tiny.run(b, r, 1024)
    assert np.all(th2 == 7.0)


def test_speakerid_stub():
    stub = SpeakerIdStub(every=3)
    msgs = [stub.step(np.ones(4)) for _ in range(8)]
    assert sum(m is not None for m in msgs) == 2


def test_closed_loop_with_das():
    from beamform_tpu.config import parse_array_config
    doc = {f"mic{i}": {"id": i, "x": x, "y": y}
           for i, (x, y) in enumerate(AIRA3)}
    cfg = parse_array_config(doc)
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    x = make_scene(AIRA3, seconds=0.2, theta_deg=30.0, hop=HOP, seed=8)
    sess = StreamingSession(get_model("das", engine, cfg))
    doa = GradientDoa(theta=0.0, mu=10.0, num_win=8, vad_threshold=0.0,
                      energy_mode="rms")
    y, thetas = run_closed_loop(sess, doa, x, chunk_frames=4)
    assert np.isfinite(y).all()
    assert thetas.shape[0] == y.shape[0] // HOP
    # the controller must actually have steered at some point
    assert np.unique(thetas).size > 1


def test_spec_doa_monitor(tmp_path):
    """The live monitor records the reference's three scatter series
    (energy2theta-spec.py:91-95) and renders headlessly to a file; the
    controller's trajectory is unchanged by monitoring."""
    from beamform_tpu.doa import SpecDoaMonitor, SpecGradientDoa

    rng = np.random.default_rng(5)
    b = np.zeros(10 * HOP)
    r = 0.1 * rng.standard_normal(10 * HOP)

    plain = SpecGradientDoa(theta=5.0, num_win=4, vad_threshold=0.0)
    th_plain = plain.run(b, r, HOP)

    out = tmp_path / "spec_doa.png"
    mon = SpecDoaMonitor(out_path=str(out))
    watched = SpecGradientDoa(theta=5.0, num_win=4, vad_threshold=0.0,
                              monitor=mon)
    th_watched = watched.run(b, r, HOP)

    np.testing.assert_array_equal(th_plain, th_watched)
    # one (rms, delta, energy) triple per objective evaluation; the first
    # gated step evaluates twice (past_energy bootstrap,
    # energy2theta-spec.py:132-135)
    assert len(mon.rms_series) == len(mon.delta_series) \
        == len(mon.energy_series) >= 6
    # rms is the newest-window rms of (ref - beamformed)
    w4 = r[4 * HOP:5 * HOP] - b[4 * HOP:5 * HOP]
    assert np.isclose(mon.rms_series[0], np.sqrt(np.mean(w4 ** 2)))
    if mon.plotting:              # matplotlib present: Agg figure on disk
        mon.close()
        assert out.exists() and out.stat().st_size > 0
