"""Block-LMS GSC fast mode (solver="blocklms", docs/PARITY.md #24).

Three layers of evidence for the NON-faithful mode:
  1. the Pallas kernel bit-matches its pure-JAX scan formulation
     (interpret mode on CPU), including VAD gating and state chaining;
  2. the model routes solver="blocklms" through the scan path off-TPU with
     streaming == offline identity and batched == single-stream parity;
  3. quality parity: on a two-source scene the block-LMS SIR gain is
     within 0.5 dB of the faithful per-sample mode (the VERDICT round-3
     acceptance bar for diverging from gsc.cpp:162-169 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beamform_tpu.config import EngineConfig, GscParams
from beamform_tpu.evaluation import evaluate_separation, synth_scene
from beamform_tpu.geometry import ArrayGeometry
from beamform_tpu.kernels.gsc_blocklms import (
    gsc_blocklms_pallas_batched, gsc_blocklms_scan)
from beamform_tpu.models.gsc import GscModel, gsc_init_state


@pytest.mark.parametrize("use_vad", [False, True])
@pytest.mark.parametrize("block", [128, 256, 512])
def test_kernel_matches_scan(use_vad, block):
    m, k = 4, 128
    s = 2 * 1024
    params = GscParams(mu0=0.0005, mu_max=0.01, filter_size=k,
                       use_vad=use_vad, vad_threshold=0.05,
                       solver="blocklms", block_samples=block)
    rng = np.random.default_rng(0)
    aligned = (0.2 * rng.standard_normal((m, s))).astype(np.float32)
    st = gsc_init_state(m, k, jnp.float32)

    out_s, blk_s, flt_s, lo_s = gsc_blocklms_scan(
        jnp.asarray(aligned), st.block, st.filt, st.last_out, params)
    out_k, blk_k, flt_k, lo_k = gsc_blocklms_pallas_batched(
        jnp.asarray(aligned)[None], st.block[None], st.filt[None],
        st.last_out[None], params, chunk=1024, interpret=True)

    np.testing.assert_allclose(np.asarray(out_k[0]), np.asarray(out_s),
                               atol=5e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(flt_k[0]), np.asarray(flt_s),
                               atol=2e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(blk_k[0]), np.asarray(blk_s),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(lo_k[0]), np.asarray(lo_s),
                               atol=5e-6)


def test_kernel_state_continuity():
    """Two kernel invocations chain state exactly like one long run."""
    m, k = 3, 128
    params = GscParams(mu0=0.001, mu_max=0.01, filter_size=k,
                       solver="blocklms")
    rng = np.random.default_rng(1)
    a = (0.1 * rng.standard_normal((m, 2 * 1024))).astype(np.float32)
    st = gsc_init_state(m, k, jnp.float32)

    ab = jnp.asarray(a)[None]
    full = gsc_blocklms_pallas_batched(
        ab, st.block[None], st.filt[None], st.last_out[None], params,
        chunk=1024, interpret=True)
    y1, b1, f1, l1 = gsc_blocklms_pallas_batched(
        ab[:, :, :1024], st.block[None], st.filt[None], st.last_out[None],
        params, chunk=1024, interpret=True)
    y2, b2, f2, l2 = gsc_blocklms_pallas_batched(
        ab[:, :, 1024:], b1, f1, l1, params, chunk=1024, interpret=True)

    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
        np.asarray(full[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(full[2]),
                               atol=1e-6)


def _scene_and_engine():
    fs = 48000
    hop = 256
    array = [(0.0, 0.0), (0.0, -0.5), (-0.45, -0.25), (0.3, 0.4)]
    geom = ArrayGeometry.from_xy(array)
    rng = np.random.default_rng(3)
    s = int(fs * 0.6) // 1024 * 1024
    k = np.hanning(16)
    k /= k.sum()

    def band(seed):
        r = np.random.default_rng(seed)
        return np.convolve(r.standard_normal(s) * 0.25, k, "same")

    scene = synth_scene(geom, [band(1), band(2)], [0.0, 90.0], fs,
                        noise_std=0.001)
    engine = EngineConfig(sample_rate=fs, window_size=hop, dtype="float32")
    return geom, scene, engine


def test_blocklms_sir_parity_with_faithful():
    """The acceptance bar for the non-faithful mode: SIR gain within
    0.5 dB of the faithful per-sample recurrence on a two-source scene.

    The gate is anchored to a baseline that WORKS (VERDICT round-4 item 3):
    after the round-5 synth_scene delay-sign fix, the faithful GSC gains
    ~21 dB SIR on this scene (blocklms ~21.7 dB — the delayed updates act
    like a mildly regularized step), so passing the 0.5 dB band is
    evidence of quality parity, not of two equally-broken runs agreeing."""
    geom, scene, engine = _scene_and_engine()
    faithful = GscModel(engine, geom, GscParams(solver="sample"))
    fast = GscModel(engine, geom, GscParams(solver="blocklms"))
    rep_f = evaluate_separation(faithful, scene, theta=0.0)
    rep_b = evaluate_separation(fast, scene, theta=0.0)
    # the baseline itself must separate strongly, else the band is void
    assert rep_f["sir_gain_db"] > 10.0, rep_f
    # one-sided: the fast mode must not separate worse; better is fine
    assert rep_b["sir_gain_db"] >= rep_f["sir_gain_db"] - 0.5, (
        rep_f, rep_b)


@pytest.mark.parametrize("block", [256, 512])
def test_larger_blocks_sir_band(block):
    """block_samples > 128 trades more filter staleness for a shorter
    serial chain (the single-stream throughput lever). Pin the quality
    cost on the same working scene: within 1.0 dB of the faithful mode."""
    geom, scene, engine = _scene_and_engine()
    faithful = GscModel(engine, geom, GscParams(solver="sample"))
    fast = GscModel(engine, geom,
                    GscParams(solver="blocklms", block_samples=block))
    rep_f = evaluate_separation(faithful, scene, theta=0.0)
    rep_b = evaluate_separation(fast, scene, theta=0.0)
    assert rep_f["sir_gain_db"] > 10.0, rep_f
    assert rep_b["sir_gain_db"] >= rep_f["sir_gain_db"] - 1.0, (
        rep_f, rep_b)


def test_block_samples_validation():
    params = GscParams(solver="blocklms", block_samples=200)
    with pytest.raises(ValueError, match="block_samples"):
        gsc_blocklms_scan(jnp.zeros((3, 1024), jnp.float32),
                          jnp.zeros((2, 128)), jnp.zeros((2, 128)),
                          jnp.zeros(128), params)


def test_model_streaming_identity():
    """Chunked streaming == offline, and the batched path == per-stream,
    through the blocklms scan route (CPU)."""
    geom, scene, engine = _scene_and_engine()
    model = GscModel(engine, geom, GscParams(solver="blocklms"))
    x = scene.mixture.astype(np.float32)

    offline = np.asarray(model.process(x, theta=0.0))
    state = model.stream_init()
    chunks = []
    step = 4 * engine.hop
    for i in range(0, x.shape[1], step):
        y, state = model.process_chunk(x[:, i:i + step], 0.0, state)
        chunks.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(chunks), offline,
                               atol=1e-5, rtol=1e-4)


def test_model_batched_matches_single():
    geom, scene, engine = _scene_and_engine()
    model = GscModel(engine, geom, GscParams(solver="blocklms"))
    x = scene.mixture.astype(np.float32)
    x2 = 0.7 * x[:, ::-1].copy()
    xb = np.stack([x, x2])

    singles = [np.asarray(model.process(xi, theta=0.0)) for xi in xb]
    t = xb.shape[-1] // engine.hop
    ctrl = model.batch_controls(np.zeros((2, t)))
    state = model.batched_state_init(2)
    outs, _ = model.batched_forward(jnp.asarray(xb), ctrl, state)
    for got, want in zip(np.asarray(outs), singles):
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
