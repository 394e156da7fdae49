"""Offline (whole-file) execution: the batch replacement for the reference's
real-time JACK callback loop. One call = the entire dataflow graph that the
reference spreads over ROS-connected processes (SURVEY.md §2 parallelism
table)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from beamform_tpu.config import ArrayConfig, EngineConfig
from beamform_tpu.models import get_model


def run_offline(model_name: str, x, *, engine: Optional[EngineConfig] = None,
                array_cfg: Optional[ArrayConfig] = None,
                theta=None,
                params: Optional[Dict[str, Any]] = None,
                interference=None) -> np.ndarray:
    """Run one beamformer over a multichannel signal.

    x: (M, S) float array. theta: scalar angle in degrees or a per-frame
    timeline (T,) — the replacement for the /theta topic. Returns (S',)
    with S' = S rounded up to a hop multiple; sample s of the output
    corresponds to input sample s - hop (one window of algorithmic latency,
    util.h:276-278).
    """
    engine = engine or EngineConfig()
    if array_cfg is None:
        raise ValueError("array_cfg is required")
    model = get_model(model_name, engine, array_cfg, params)
    if theta is None:
        theta = array_cfg.initial_angle
    if interference is not None:
        return np.asarray(model.process(x, theta, interference=interference))
    return np.asarray(model.process(x, theta))
