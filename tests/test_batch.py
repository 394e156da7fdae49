"""Batched multi-stream execution equals per-stream execution."""

import numpy as np
import pytest

from beamform_tpu.config import EngineConfig, parse_array_config
from beamform_tpu.models import get_model
from beamform_tpu.runtime.batch import BatchRunner

from conftest import AIRA3, make_scene

HOP = 128


def cfg3():
    return parse_array_config({f"mic{i}": {"id": i, "x": x, "y": y}
                               for i, (x, y) in enumerate(AIRA3)})


@pytest.mark.parametrize("name,params", [
    ("das", {}),
    ("mcra", dict(L=10)),
    ("gss", dict(freq_mag_threshold=0.0008, freq_max=16000.0,
                 freq_min=100.0, mu=0.001)),
    ("gsc", dict(mu0=0.0001, mu_max=0.1, filter_size=16)),
])
def test_batch_matches_single(name, params):
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    b = 3
    xs = np.stack([make_scene(AIRA3, seconds=0.1, theta_deg=10.0 + 7 * i,
                              seed=10 + i, hop=HOP) for i in range(b)])
    thetas = np.array([5.0, -20.0, 40.0])

    runner = BatchRunner(name, engine, cfg3(), params, batch=b)
    yb = np.asarray(runner.process(xs, thetas))

    model = get_model(name, engine, cfg3(), params)
    for i in range(b):
        yi = np.asarray(model.process(xs[i], float(thetas[i])))
        np.testing.assert_allclose(yb[i], yi, atol=1e-10)


def test_batch_state_carries():
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    b = 2
    xs = np.stack([make_scene(AIRA3, seconds=0.1, seed=20 + i, hop=HOP)
                   for i in range(b)])
    runner = BatchRunner("mcra", engine, cfg3(), dict(L=5), batch=b)
    half = xs.shape[-1] // (2 * HOP) * HOP
    y1 = np.asarray(runner.process(xs[:, :, :half]))
    y2 = np.asarray(runner.process(xs[:, :, half:]))

    model = get_model("mcra", engine, cfg3(), dict(L=5))
    for i in range(b):
        full = np.asarray(model.process(xs[i]))
        np.testing.assert_allclose(np.concatenate([y1[i], y2[i]]), full,
                                   atol=1e-10)
