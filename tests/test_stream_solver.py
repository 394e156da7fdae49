"""The fused streaming MVDR/LCMV solver matches the dense path.

The stream kernel (kernels/mvdr_stream.py, kernels/lcmv_stream.py) is the
TPU float32 production strategy; here it runs in interpret mode on the CPU
mesh against the dense block pipeline on the same float32 inputs. Agreement
is at f32 round-off (different summation/solve order), not bit-exact — the
bit-level parity contract vs the float64 oracle lives on the dense path
(tests/test_parity.py) and the on-chip deviation budget on
tools/tpu_deviation_sweep.py.
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
def test_stream_equals_dense(name):
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)

    dense = get_model(name, engine, cfg3(), dict(BASE, solver="dense"))
    stream = get_model(name, engine, cfg3(), dict(BASE, solver="stream"))
    y_d = np.asarray(dense.process(x, 20.0))
    y_s = np.asarray(stream.process(x, 20.0))
    scale = max(np.abs(y_d).max(), 1e-12)
    assert np.abs(y_s - y_d).max() / scale < 2e-4, (
        np.abs(y_s - y_d).max() / scale)


def test_stream_streaming_equals_offline():
    """Chunked stream-solver output matches one-shot (the kernel rebuilds
    its covariance from the carried W-frame history each chunk)."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    model = get_model("mvdr", engine, cfg3(), dict(BASE, solver="stream"))
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


def test_stream_rejects_float64():
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    model = get_model("mvdr", engine, cfg3(), dict(BASE, solver="stream"))
    x = make_scene(AIRA3, seconds=0.1, quiet_hops=2, hop=HOP)
    with pytest.raises(ValueError, match="float32"):
        model.process(x, 20.0)


def _ring_cfg(m):
    from beamform_tpu.config import parse_array_config
    ang = np.linspace(0, 2 * np.pi, m, endpoint=False)
    return parse_array_config(
        {f"mic{i}": {"id": i, "x": 0.05 * np.cos(a), "y": 0.05 * np.sin(a)}
         for i, a in enumerate(ang)})


def test_auto_falls_back_to_dense_beyond_kernel_capacity():
    """solver='auto' must not trace the stream kernel past its on-core
    limits: >32 mics (the analysis channel cap) or a VMEM-overflowing
    (mics, in-band bins) scratch both select the dense path."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    big = get_model("mvdr", engine, _ring_cfg(40), dict(BASE))
    assert not big._use_stream()

    # m=32 fits the channel cap but 8x(32,32,NIBP) f32 scratch overflows
    # the VMEM budget once the in-band bin count pads past ~512
    wide_engine = EngineConfig(sample_rate=48000, window_size=1024,
                               dtype="float32")
    wide = get_model("mvdr", wide_engine, _ring_cfg(32), dict(BASE))
    assert not wide._use_stream()

    small = get_model("mvdr", engine, cfg3(), dict(BASE, solver="stream"))
    assert small._use_stream()


def test_forced_stream_beyond_capacity_raises():
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    for name in ("mvdr", "lcmv"):
        model = get_model(name, engine, _ring_cfg(40),
                          dict(BASE, solver="stream"))
        with pytest.raises(ValueError, match="capacity"):
            model._use_stream()


def test_legacy_sparse_float64_maps_to_dense():
    """solver='sparse' on a float64 engine ran the gated-sparse path before
    round 2; it now deprecation-maps to dense instead of raising, so pinned
    configs keep working."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float64")
    x = make_scene(AIRA3, seconds=0.1, quiet_hops=4, hop=HOP)
    for name in ("mvdr", "lcmv"):
        sparse = get_model(name, engine, cfg3(),
                           dict(BASE, solver="sparse"))
        dense = get_model(name, engine, cfg3(), dict(BASE, solver="dense"))
        with pytest.warns(DeprecationWarning):
            assert not sparse._use_stream()
        y_s = np.asarray(sparse.process(x, 20.0))
        y_d = np.asarray(dense.process(x, 20.0))
        np.testing.assert_allclose(y_s, y_d)


def test_control_cache_is_lru():
    """Overflowing the control cache evicts only the least-recently-used
    entry — a 17th key must not wipe the 16 hot ones (the old clear()-at-
    capacity behavior re-uploaded every control array after overflow)."""
    engine = EngineConfig(sample_rate=48000, window_size=HOP,
                          dtype="float32")
    model = get_model("mvdr", engine, cfg3(), dict(BASE, solver="dense"))
    builds = []
    for k in range(16):
        model._cached(("k", k), lambda k=k: builds.append(k) or k)
    model._cached(("k", 0), lambda: builds.append("rebuild-0"))  # refresh 0
    model._cached(("k", 16), lambda: builds.append(16) or 16)    # evicts 1
    for k in [0] + list(range(2, 17)):
        model._cached(("k", k), lambda k=k: builds.append(("miss", k)))
    assert builds == list(range(16)) + [16], builds


def test_lcmv_stream_with_interference_timeline():
    """Constraint slots (add/remove via the masked timeline) flow through
    the stream kernel and match the dense path."""
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
    stream = get_model("lcmv", engine, cfg3(), dict(BASE, solver="stream"))
    y_d = np.asarray(dense.process(x, 20.0, interference=tl))
    y_s = np.asarray(stream.process(x, 20.0, interference=tl))
    scale = max(np.abs(y_d).max(), 1e-12)
    # M=3 with up to 3 constraints is a fully determined, ill-conditioned
    # system; two f32 algorithms legitimately differ at ~3e-4 relative
    assert np.abs(y_s - y_d).max() / scale < 1e-3
