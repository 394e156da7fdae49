"""Full-FFT audit mode: the extended-rFFT layout's equivalence, executed.

``EngineConfig.full_fft`` runs every model on the reference's literal
N-point complex FFT layout (das.cpp:127-128) with the full quirky frequency
vector (util.h:190-199). On f64 the two layouts must agree to fp noise —
this is the executable form of the shadow-bin equivalence argument
(models/common.py layout note).
"""

import numpy as np
import pytest

from beamform_tpu.config import EngineConfig, parse_array_config
from beamform_tpu.models import get_model

from conftest import AIRA3, make_scene

HOP = 128

PARAMS = {
    "das": {},
    "phase": {},
    "mcra": dict(L=10),
    "mvdr": dict(past_windows=6, freq_mag_threshold=0.0008,
                 freq_max=16000.0, freq_min=100.0),
    "lcmv": dict(past_windows=6, freq_mag_threshold=0.0008,
                 freq_max=16000.0, freq_min=100.0),
    "gss": dict(freq_mag_threshold=0.0008, freq_max=16000.0,
                freq_min=100.0, mu=0.001),
    "gsc": dict(mu0=0.0001, mu_max=0.1, filter_size=16),
    "phasempf": dict(min_phase=30.0, MCRA_L=10, smooth_size=3),
}


def cfg3():
    return parse_array_config({f"mic{i}": {"id": i, "x": x, "y": y}
                               for i, (x, y) in enumerate(AIRA3)})


@pytest.mark.parametrize("name", sorted(PARAMS))
def test_full_fft_equals_extended_rfft(name):
    x = make_scene(AIRA3, seconds=0.25, quiet_hops=8, hop=HOP)
    eng_ext = EngineConfig(sample_rate=48000, window_size=HOP,
                           dtype="float64")
    eng_full = EngineConfig(sample_rate=48000, window_size=HOP,
                            dtype="float64", full_fft=True)
    y_ext = np.asarray(get_model(name, eng_ext, cfg3(),
                                 PARAMS[name]).process(x, 20.0))
    y_full = np.asarray(get_model(name, eng_full, cfg3(),
                                  PARAMS[name]).process(x, 20.0))
    np.testing.assert_allclose(y_ext, y_full, atol=1e-10, err_msg=name)


def test_full_fft_bin_count():
    from beamform_tpu.models import common
    eng = EngineConfig(sample_rate=48000, window_size=HOP, dtype="float64",
                       full_fft=True)
    assert len(common.make_freqs_ext(eng)) == eng.fft_win
    m = get_model("das", eng, cfg3(), {})
    assert len(m.freqs) == eng.fft_win
