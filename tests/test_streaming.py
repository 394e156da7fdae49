"""Streaming engine: chunked == offline for every model; checkpoint/resume."""

import numpy as np
import pytest

from beamform_tpu.config import EngineConfig
from beamform_tpu.geometry import ArrayGeometry
from beamform_tpu.models import get_model
from beamform_tpu.runtime.streaming import StreamingSession

from conftest import AIRA3, make_scene

HOP = 128
FS = 48000

PARAMS = {
    "das": {},
    "phase": {},
    "ref": {},
    "read": {},
    "mcra": dict(L=10, out_only_noise=False),
    "phasempf": dict(min_phase=30.0, min_mag=0.05, smooth_size=3, MCRA_L=8),
    "mvdr": dict(past_windows=5, freq_mag_threshold=0.0008,
                 freq_max=16000.0, freq_min=100.0, out_amp=1.0),
    "lcmv": dict(past_windows=5, freq_mag_threshold=0.0008,
                 freq_max=16000.0, freq_min=100.0, out_amp=1.0),
    "gss": dict(freq_mag_threshold=0.0008, freq_max=16000.0, freq_min=100.0,
                out_amp=0.1, mu=0.001),
    "gsc": dict(mu0=0.0001, mu_max=0.1, filter_size=16),
}


def build(name):
    from beamform_tpu.config import parse_array_config
    doc = {f"mic{i}": {"id": i, "x": x, "y": y}
           for i, (x, y) in enumerate(AIRA3)}
    if name in ("lcmv", "gss"):
        doc["angle_interf1"] = 70.0
    cfg = parse_array_config(doc)
    engine = EngineConfig(sample_rate=FS, window_size=HOP, dtype="float64")
    return get_model(name, engine, cfg, PARAMS[name])


@pytest.mark.parametrize("name", sorted(PARAMS))
def test_chunked_equals_offline(name):
    model = build(name)
    x = make_scene(AIRA3, seconds=0.2, theta_deg=25.0, hop=HOP, seed=4,
                   quiet_hops=6)
    offline = np.asarray(model.process(x, 25.0))

    sess = StreamingSession(model)
    chunk = 4 * HOP
    outs = [np.asarray(sess.process(x[:, i:i + chunk], 25.0))
            for i in range(0, x.shape[1], chunk)]
    np.testing.assert_allclose(np.concatenate(outs), offline, atol=1e-12)


def test_streaming_theta_change_matches_offline():
    model = build("gss")
    x = make_scene(AIRA3, seconds=0.2, theta_deg=25.0, hop=HOP, seed=5)
    t = x.shape[1] // HOP
    th = np.full(t, 10.0)
    th[t // 2:] = -30.0
    offline = np.asarray(model.process(x, th))

    sess = StreamingSession(model)
    cf = 4
    outs = []
    for i in range(0, t, cf):
        outs.append(np.asarray(sess.process(
            x[:, i * HOP:(i + cf) * HOP], th[i:i + cf])))
    np.testing.assert_allclose(np.concatenate(outs), offline, atol=1e-12)


def test_checkpoint_resume(tmp_path):
    model = build("mcra")
    x = make_scene(AIRA3, seconds=0.2, hop=HOP, seed=6)
    t = x.shape[1]
    half = (t // (2 * HOP)) * HOP

    sess = StreamingSession(model)
    y1 = np.asarray(sess.process(x[:, :half]))
    ckpt = str(tmp_path / "state.npz")
    sess.save(ckpt)

    # resume in a brand-new session (fresh model instance)
    model2 = build("mcra")
    sess2 = StreamingSession(model2)
    sess2.load(ckpt)
    y2 = np.asarray(sess2.process(x[:, half:]))

    full = np.asarray(model.process(x))
    np.testing.assert_allclose(np.concatenate([y1, y2]), full, atol=1e-12)
    assert sess2.frames_done == t // HOP


def test_chunk_must_be_hop_multiple():
    model = build("das")
    sess = StreamingSession(model)
    with pytest.raises(AssertionError):
        sess.process(np.zeros((3, HOP + 1)))


def test_long_stream_constant_state():
    """Hour-scale streaming is O(1) memory by construction: the session
    state pytree never grows with the number of chunks processed."""
    import jax
    model = build("phasempf")
    sess = StreamingSession(model, chunk_frames=4)
    size0 = sum(np.asarray(leaf).nbytes
                for leaf in jax.tree.leaves(sess.state))
    rng = np.random.default_rng(12)
    for _ in range(50):   # 50 chunks through one compiled step
        sess.process(0.05 * rng.standard_normal((3, 4 * HOP)), 10.0)
    size1 = sum(np.asarray(leaf).nbytes
                for leaf in jax.tree.leaves(sess.state))
    assert size1 == size0
    assert sess.frames_done == 200
