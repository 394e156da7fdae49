"""Geometry, frequency vector and steering weights vs the oracle
transliterations and the reference's documented quirks."""

import numpy as np

from beamform_tpu.config import parse_array_config
from beamform_tpu.geometry import (
    ArrayGeometry, frequency_vector, steering_delays, steering_weights)
from beamform_tpu.oracle.nodes import (
    oracle_delays, oracle_freqs, oracle_polar, oracle_weights)

AIRA3 = [(0.0, 0.0), (0.0, -0.18), (-0.156, -0.09)]


def test_freq_vector_quirk():
    """util.h:190-199: f[N/2-1] is overwritten to fs/2; f[N/2] stays 0."""
    n, fs = 256, 48000
    f = frequency_vector(n, fs)
    np.testing.assert_allclose(f, oracle_freqs(n, fs))
    assert f[n // 2 - 1] == fs / 2
    assert f[n // 2] == 0.0
    assert f[1] == fs / n
    assert f[n - 1] == -fs / n
    # exact mode: standard layout
    fe = frequency_vector(n, fs, exact=True)
    assert fe[n // 2 - 1] == (n // 2 - 1) / n * fs
    assert fe[n // 2] == fs / 2


def test_delays_match_oracle():
    dist, ang = oracle_polar(AIRA3)
    geom = ArrayGeometry.from_xy(AIRA3)
    for theta in [0.0, 25.0, -90.0, 180.0, -179.5, 135.0]:
        np.testing.assert_allclose(
            np.asarray(steering_delays(geom, theta)),
            oracle_delays(dist, ang, theta), atol=1e-15)


def test_weights_match_oracle():
    n, fs = 128, 48000
    freqs = frequency_vector(n, fs)
    geom = ArrayGeometry.from_xy(AIRA3)
    tau = np.asarray(steering_delays(geom, 30.0))
    w = np.asarray(steering_weights(freqs, tau))
    wo = oracle_weights(freqs, oracle_delays(*oracle_polar(AIRA3), 30.0))
    np.testing.assert_allclose(w, wo, atol=1e-12)
    np.testing.assert_array_equal(w[0], np.ones(n))


def test_config_parsing_sentinel_and_rereference():
    doc = {
        "verbose": True,
        "initial_angle": 5.0,
        "mic0": {"id": 0, "x": 0.1, "y": 0.2},
        "mic1": {"id": 1, "x": 0.1, "y": 0.0},
        "mic2": {"id": 2, "x": -0.1, "y": 0.2, "z": 0.5},  # z ignored
        "angle_interf1": 40.0,
        "angle_interf2": -40.0,
        "angle_interf3": 181.0,   # sentinel stops parsing
        "angle_interf4": 10.0,    # must be ignored
    }
    cfg = parse_array_config(doc)
    assert cfg.num_mics == 3
    assert cfg.interference_angles == (40.0, -40.0)
    # polar coords from RAW x/y, not re-referenced (util.h:83-84)
    assert abs(cfg.mics[1].dist - np.hypot(0.1, 0.0)) < 1e-12
    # corrected mode: polar from re-referenced coords
    cfg2 = parse_array_config(doc, rereference_polar=True)
    assert abs(cfg2.mics[1].dist - np.hypot(0.0, -0.2)) < 1e-12


def test_mic0_nonzero_origin_quirk():
    """aira16-style geometry with mic0 off the origin: faithful polar coords
    come from the raw coordinates."""
    xy = [(0.158, 0.115), (0.158, -0.115), (-0.045, 0.0)]
    dist, ang = oracle_polar(xy)
    geom = ArrayGeometry.from_xy(xy)
    np.testing.assert_allclose(geom.dist, dist)
    np.testing.assert_allclose(geom.angle_deg, ang)
    assert geom.dist[0] > 0  # mic0 keeps its raw distance (unused: tau0=0)
    np.testing.assert_allclose(
        np.asarray(steering_delays(geom, 12.0)),
        oracle_delays(dist, ang, 12.0), atol=1e-15)
