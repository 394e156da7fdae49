from beamform_tpu.parallel.mesh import make_mesh  # noqa: F401
from beamform_tpu.parallel.sharded import (  # noqa: F401
    sharded_spectral_pipeline,
    sharded_training_step,
)
