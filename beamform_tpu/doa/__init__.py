from beamform_tpu.doa.vad import EnergyVad  # noqa: F401
from beamform_tpu.doa.energy2theta import (  # noqa: F401
    GradientDoa, DiffGradientDoa, SpecGradientDoa)
from beamform_tpu.doa.sir2theta import SirToTheta, SirDummy  # noqa: F401
from beamform_tpu.doa.monitor import SpecDoaMonitor  # noqa: F401
