"""Model registry: the seven beamformers + mcra + utility nodes, matching the
reference's executable inventory (beamform/CMakeLists.txt:53-63)."""

from __future__ import annotations

from typing import Any, Dict, Optional

from beamform_tpu.config import ArrayConfig, EngineConfig, make_params
from beamform_tpu.geometry import ArrayGeometry

MODEL_REGISTRY: Dict[str, Any] = {}


def register(name):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls
    return deco


def get_model(name: str, engine: EngineConfig, array_cfg: ArrayConfig,
              param_overrides: Optional[Dict[str, Any]] = None,
              theta: Optional[float] = None):
    """Build a model from configs the way a launch file builds a node."""
    _ensure_registered()
    cls = MODEL_REGISTRY[name]
    geom = ArrayGeometry.from_config(array_cfg)
    params = make_params(name, param_overrides)
    kw = {}
    if name in ("lcmv", "gss"):
        kw["interference_angles"] = array_cfg.interference_angles
    return cls(engine, geom, params, **kw)


def _ensure_registered():
    # Imported lazily to avoid import cycles.
    from beamform_tpu.models.das import DasModel
    from beamform_tpu.models.phase import PhaseModel
    from beamform_tpu.models.mcra import McraModel
    from beamform_tpu.models.phasempf import PhasempfModel
    from beamform_tpu.models.mvdr import MvdrModel
    from beamform_tpu.models.lcmv import LcmvModel
    from beamform_tpu.models.gss import GssModel
    from beamform_tpu.models.gsc import GscModel
    from beamform_tpu.models.refmic import RefModel, ReadModel

    MODEL_REGISTRY.update({
        "das": DasModel,
        "phase": PhaseModel,
        "mcra": McraModel,
        "phasempf": PhasempfModel,
        "mvdr": MvdrModel,
        "lcmv": LcmvModel,
        "gss": GssModel,
        "gsc": GscModel,
        "ref": RefModel,
        "read": ReadModel,
    })

