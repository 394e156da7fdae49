"""Evaluation harness: scene synthesis, alignment, SIR gains of the
steered beamformers on controlled two-source scenes."""

import numpy as np
import pytest

from beamform_tpu.config import (EngineConfig, GssParams, LcmvParams,
                                 PhaseParams)
from beamform_tpu.evaluation import (
    Scene, align_to_ref, evaluate_separation, si_sdr, synth_scene)
from beamform_tpu.geometry import ArrayGeometry
from beamform_tpu.models.das import DasModel
from beamform_tpu.models.gss import GssModel
from beamform_tpu.models.lcmv import LcmvModel
from beamform_tpu.models.phase import PhaseModel

HOP = 256
FS = 48000
# a wider array separates better at speech frequencies
ARRAY = [(0.0, 0.0), (0.0, -0.5), (-0.45, -0.25), (0.3, 0.4)]


def _sources(seconds=0.6, seed=0):
    rng = np.random.default_rng(seed)
    s = int(FS * seconds) // HOP * HOP
    k = np.hanning(16)
    k /= k.sum()

    def band(seed2):
        r = np.random.default_rng(seed2)
        sig = np.convolve(r.standard_normal(s) * 0.25, k, "same")
        # quiet lead-in: the cold MVDR/LCMV covariance history is singular
        # (faithfully NaN, like the reference's Eigen garbage) until
        # past_windows frames have accumulated
        sig[:12 * HOP] *= 1e-5
        return sig

    return band(1), band(2), s


def _scene():
    geom = ArrayGeometry.from_xy(ARRAY)
    s1, s2, s = _sources()
    return geom, synth_scene(geom, [s1, s2], [0.0, 90.0], FS,
                             noise_std=0.001)


def test_scene_groundtruth_consistency():
    geom, scene = _scene()
    np.testing.assert_allclose(
        scene.mixture, scene.images.sum(axis=0) + scene.noise, atol=1e-12)
    # mic0 is the geometry reference: zero delay, image == source-aligned
    assert scene.images.shape[0] == 2


def test_si_sdr_basics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000)
    assert si_sdr(2.5 * x, x) > 60.0            # scale-invariant
    assert si_sdr(rng.standard_normal(1000), x) < 5.0


def test_das_improves_sir():
    geom, scene = _scene()
    engine = EngineConfig(sample_rate=FS, window_size=HOP, dtype="float64")
    rep = evaluate_separation(DasModel(engine, geom), scene, theta=0.0)
    assert rep["sir_gain_db"] > 1.0, rep


def test_lcmv_distortionless_and_null():
    """The LCMV constraints hold: unit gain toward the DOI (target-only
    scene passes through) and a null toward the declared interference
    (interferer-only scene is strongly suppressed)."""
    geom = ArrayGeometry.from_xy(ARRAY)
    s1, s2, s = _sources()
    engine = EngineConfig(sample_rate=FS, window_size=HOP, dtype="float64")
    params = LcmvParams(past_windows=6, freq_mag_threshold=1e-4,
                        freq_max=20000.0, freq_min=50.0, out_amp=1.0)
    model = LcmvModel(engine, geom, params, interference_angles=(90.0,))

    # constraint satisfaction of the solver itself: C^H w = e0 exactly
    # (lcmv.cpp:116-119 algebra), on a well-conditioned covariance
    import jax.numpy as jnp
    from beamform_tpu.models.lcmv import lcmv_solve
    rng = np.random.default_rng(3)
    z = rng.standard_normal((50, 4, 12)) + 1j * rng.standard_normal(
        (50, 4, 12))
    r = jnp.asarray(z @ z.conj().transpose(0, 2, 1) + 0.01 * np.eye(4))
    cmat = jnp.asarray(rng.standard_normal((50, 4, 2))
                       + 1j * rng.standard_normal((50, 4, 2)))
    w = np.asarray(lcmv_solve(r, cmat))
    resid = np.einsum("bms,bm->bs", np.conj(np.asarray(cmat)), w)
    np.testing.assert_allclose(resid[:, 0], 1.0, atol=1e-8)
    np.testing.assert_allclose(resid[:, 1], 0.0, atol=1e-8)

    lead = 14 * HOP
    itf_scene = synth_scene(geom, [s2], [90.0], FS, noise_std=1e-5)
    model2 = LcmvModel(engine, geom, params, interference_angles=(90.0,))
    y_i = align_to_ref(np.asarray(model2.process(itf_scene.mixture, 0.0)),
                       HOP)
    p_in = np.mean(itf_scene.mixture[0, lead:] ** 2)
    p_out = np.mean(y_i[lead:] ** 2)
    assert p_out < 0.15 * p_in, (p_out, p_in)   # > ~8 dB null


def test_phase_mask_improves_sir():
    geom, scene = _scene()
    engine = EngineConfig(sample_rate=FS, window_size=HOP, dtype="float64")
    model = PhaseModel(engine, geom,
                       PhaseParams(min_phase=40.0, mag_mult=0.05,
                                   mag_threshold=0.0))
    rep = evaluate_separation(model, scene, theta=0.0)
    assert rep["sir_gain_db"] > 0.5, rep


def test_spectral_delay_matches_linear_on_lowpass():
    """delay="spectral" is the exact fractional delay; on a low-passed
    source (where linear interpolation's phase error is negligible) the two
    propagation models produce nearly identical images."""
    geom = ArrayGeometry.from_xy(ARRAY)
    rng = np.random.default_rng(5)
    s = 4096
    k = np.hanning(64)
    src = np.convolve(rng.standard_normal(s), k / k.sum(), "same")
    lin = synth_scene(geom, [src], [30.0], FS, delay="linear")
    spec = synth_scene(geom, [src], [30.0], FS, delay="spectral")
    # ignore the block edges (spectral delay wraps circularly there)
    core = slice(256, s - 256)
    scale = np.abs(lin.images[0][:, core]).max()
    dev = np.abs(lin.images[0][:, core] - spec.images[0][:, core]).max()
    assert dev / scale < 0.02, dev / scale


def test_bss_project_allows_short_filters():
    """A filtered copy of the target is 'distortion' to the strict
    single-delay SIR but signal to the taps-allowed projection (the
    bss_eval convention)."""
    from beamform_tpu.evaluation import bss_project, si_sdr

    rng = np.random.default_rng(6)
    n = 20000
    tgt = rng.standard_normal(n)
    itf = rng.standard_normal(n)
    h = np.array([0.5, -0.3, 0.2, 0.1, -0.05])
    est = np.convolve(tgt, h)[:n] + 0.01 * itf
    proj = bss_project(est, tgt, itf, taps=8)
    # strict scale-invariant SDR charges the filter as distortion;
    # the taps-allowed projection recovers it as signal
    assert si_sdr(est, tgt) < 10.0
    assert proj["sdr_db"] > 25.0, proj
    assert proj["sir_db"] > 30.0, proj
    # and the interference is still charged as interference
    est_bad = np.convolve(tgt, h)[:n] + 0.5 * itf
    assert bss_project(est_bad, tgt, itf, taps=8)["sir_db"] < proj["sir_db"]


def test_evaluate_separation_skip_and_taps():
    geom, scene = _scene()
    engine = EngineConfig(sample_rate=FS, window_size=HOP, dtype="float64")
    rep = evaluate_separation(DasModel(engine, geom), scene, theta=0.0,
                              skip=4 * HOP, taps=16)
    for key in ("sir_gain_db", "sir_taps_db", "sir_taps_gain_db",
                "sdr_taps_db"):
        assert key in rep
    assert rep["sir_gain_db"] > 1.0
