"""The fused phase-mask kernels match the XLA formulations.

kernels/phase_mask.py runs alignment, the hand-rolled atan2, the pairwise
phase distances, the masks and (phasempf) the MCRA/MPF march in one Pallas
program; here it runs in interpret mode on CPU against the batched XLA
path. The contract is "tight except rare threshold flips": atan2 rounding
(~2 ulp) can flip the binary mask only where a bin's mean pair distance
sits within ~1e-6 rad of min_phase, so parity asserts the 99.9th
percentile plus a loose absolute ceiling (see the kernel docstring).
"""

import numpy as np
import pytest

from beamform_tpu.config import EngineConfig, parse_array_config
from beamform_tpu.models import get_model

from conftest import AIRA3, make_scene

HOP = 128

PMPF = dict(min_phase=30.0, min_mag=0.05, smooth_size=3, MCRA_L=50,
            out_amp=2.5)


def cfg3():
    return parse_array_config({f"mic{i}": {"id": i, "x": x, "y": y}
                               for i, (x, y) in enumerate(AIRA3)})


def engine32():
    return EngineConfig(sample_rate=48000, window_size=HOP, dtype="float32")


def assert_close_mod_flips(y_f, y_x, tight=5e-5, frac=1e-3, ceil=5e-2):
    scale = max(np.abs(y_x).max(), 1e-12)
    dev = np.abs(y_f - y_x) / scale
    assert np.percentile(dev, 99.9) < tight, np.percentile(dev, 99.9)
    assert np.mean(dev > tight) <= frac, np.mean(dev > tight)
    assert dev.max() < ceil, dev.max()


def test_atan2f_accuracy():
    """The Cephes-style polynomial matches numpy atan2 to ~2 ulp over all
    quadrants, including the axes."""
    import jax.numpy as jnp
    from beamform_tpu.kernels.phase_mask import atan2f
    rng = np.random.default_rng(0)
    y = rng.standard_normal(8192).astype(np.float32) * 10 ** rng.uniform(
        -6, 6, 8192).astype(np.float32)
    x = rng.standard_normal(8192).astype(np.float32) * 10 ** rng.uniform(
        -6, 6, 8192).astype(np.float32)
    y[:4] = [0.0, 0.0, 1.0, -1.0]
    x[:4] = [1.0, -1.0, 0.0, 0.0]
    got = np.asarray(atan2f(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    assert np.abs(got - want).max() < 1e-6, np.abs(got - want).max()


@pytest.mark.parametrize("name,extra", [("phase", {}), ("phasempf", PMPF)])
def test_fused_equals_xla(name, extra):
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    xla = get_model(name, engine32(), cfg3(), dict(extra, solver="xla"))
    fus = get_model(name, engine32(), cfg3(), dict(extra, solver="fused"))
    y_x = np.asarray(xla.process(x, 20.0))
    y_f = np.asarray(fus.process(x, 20.0))
    assert_close_mod_flips(y_f, y_x)


def test_fused_theta_timeline():
    """Per-frame steering rows flow through the pre-gathered weight
    planes."""
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    t = x.shape[-1] // HOP
    th = np.full(t, 20.0)
    th[t // 2:] = -35.0
    xla = get_model("phase", engine32(), cfg3(), dict(solver="xla"))
    fus = get_model("phase", engine32(), cfg3(), dict(solver="fused"))
    y_x = np.asarray(xla.process(x, th))
    y_f = np.asarray(fus.process(x, th))
    assert_close_mod_flips(y_f, y_x)


def test_fused_phasempf_streaming_equals_offline():
    """Chunked == offline on the fused path: WOLA carries, the MCRA/MPF
    state rows and the smoother tail survive chunk boundaries (and the
    rows<->MpfState conversion round-trips)."""
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    model = get_model("phasempf", engine32(), cfg3(),
                      dict(PMPF, solver="fused"))
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


def test_fused_state_portable_to_xla_path():
    """A checkpoint written by the fused path resumes on the XLA path:
    MpfState is the canonical representation on both."""
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    n = x.shape[-1] // HOP * HOP
    x = x[:, :n]
    half = n // 2 // HOP * HOP
    fus = get_model("phasempf", engine32(), cfg3(),
                    dict(PMPF, solver="fused"))
    xla = get_model("phasempf", engine32(), cfg3(), dict(PMPF, solver="xla"))
    y1, state = fus.process_chunk(x[:, :half], 20.0, fus.stream_init())
    y2x, _ = xla.process_chunk(x[:, half:], 20.0, state)
    y_ref = np.asarray(xla.process(x, 20.0))
    y_mix = np.concatenate([np.asarray(y1), np.asarray(y2x)])
    assert_close_mod_flips(y_mix, y_ref)


def test_fused_rejects_float64():
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    x = make_scene(AIRA3, seconds=0.1, quiet_hops=2, hop=HOP)
    for name in ("phase", "phasempf"):
        model = get_model(name, engine, cfg3(), dict(solver="fused"))
        with pytest.raises(ValueError, match="float32"):
            model.process(x, 20.0)


def test_phasempf_bug_dc_zero_flag():
    """The corrected-DC flag reaches the fused kernel's lane-0 select."""
    x = make_scene(AIRA3, seconds=0.1, quiet_hops=2, hop=HOP)
    for flag in (True, False):
        engine = EngineConfig(sample_rate=48000, window_size=HOP,
                              dtype="float32", bug_dc_zero=flag)
        xla = get_model("phasempf", engine, cfg3(), dict(PMPF, solver="xla"))
        fus = get_model("phasempf", engine, cfg3(),
                        dict(PMPF, solver="fused"))
        y_x = np.asarray(xla.process(x, 20.0))
        y_f = np.asarray(fus.process(x, 20.0))
        assert_close_mod_flips(y_f, y_x)
