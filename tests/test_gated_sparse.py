"""Gate-aware sparse solves (MVDR/LCMV) match the dense path exactly.

The sparse path must be a pure work-skipping transformation: identical
output and carried state, cost scaling with the energy-gate pass count
(mvdr.cpp:84-96 only solves passing bins).
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


def pass_rate(x, engine, params):
    from beamform_tpu.models import common
    import jax.numpy as jnp
    model = get_model("mvdr", engine, cfg3(), dict(params, solver="dense"))
    spec, _ = common.stft_ext_carry(
        jnp.asarray(x, model.rdtype), engine, model.window, model.cdtype,
        jnp.zeros((x.shape[0], engine.hop), model.rdtype))
    mag = common.mag_mean_over_mics(spec, engine.fft_win)[:, model.ib]
    return float(np.mean(np.asarray(mag) > params["freq_mag_threshold"]))


@pytest.mark.parametrize("name", ["mvdr", "lcmv"])
def test_sparse_equals_dense(name):
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    x = make_scene(AIRA3, seconds=0.3, quiet_hops=8, hop=HOP)
    # the scene must actually exercise BOTH gate outcomes
    rate = pass_rate(x, engine, BASE)
    assert 0.05 < rate < 0.95, rate

    dense = get_model(name, engine, cfg3(), dict(BASE, solver="dense"))
    sparse = get_model(name, engine, cfg3(), dict(BASE, solver="sparse"))
    y_d = np.asarray(dense.process(x, 20.0))
    y_s = np.asarray(sparse.process(x, 20.0))
    np.testing.assert_allclose(y_s, y_d, atol=1e-9)


@pytest.mark.parametrize("name", ["mvdr", "lcmv"])
def test_sparse_streaming_equals_offline(name):
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    model = get_model(name, engine, cfg3(), dict(BASE, solver="sparse"))
    full = np.asarray(model.process(x, 15.0))

    state = model.stream_init()
    outs = []
    chunk = 4 * HOP
    for i in range(0, x.shape[-1], chunk):
        y, state = model.process_chunk(x[:, i:i + chunk], 15.0, state)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), full, atol=1e-12)


def test_sparse_all_gated_off():
    """Zero passing pairs: the loop runs zero chunks, output is the 0.01
    passthrough everywhere."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    x = 1e-7 * make_scene(AIRA3, seconds=0.1, hop=HOP)
    dense = get_model("mvdr", engine, cfg3(), dict(BASE, solver="dense"))
    sparse = get_model("mvdr", engine, cfg3(), dict(BASE, solver="sparse"))
    y_d = np.asarray(dense.process(x, 0.0))
    y_s = np.asarray(sparse.process(x, 0.0))
    np.testing.assert_allclose(y_s, y_d, atol=1e-15)


def test_sparse_all_pass():
    """Every in-band pair passes: full-chunk tiling incl. the sentinel-padded
    tail must still scatter correctly."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    x = make_scene(AIRA3, seconds=0.1, hop=HOP, noise=0.2)
    params = dict(BASE, freq_mag_threshold=1e-12)
    rate = pass_rate(x, engine, params)
    assert rate == 1.0, rate
    dense = get_model("mvdr", engine, cfg3(), dict(params, solver="dense"))
    sparse = get_model("mvdr", engine, cfg3(), dict(params, solver="sparse"))
    y_d = np.asarray(dense.process(x, 10.0))
    y_s = np.asarray(sparse.process(x, 10.0))
    np.testing.assert_allclose(y_s, y_d, atol=1e-9)
