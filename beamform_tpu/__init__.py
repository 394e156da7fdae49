"""beamform_tpu — a TPU-native multichannel acoustic beamforming framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`balkce/beamform` ROS/JACK package (reference mounted at /root/reference):
seven frequency-domain beamformers (das, mvdr, gsc, lcmv, gss, phase,
phasempf), an MCRA noise estimator, utility passthrough nodes, a streaming
WOLA engine, a theta/interference control timeline, DOA refinement helpers,
WAV + sample-rate-conversion I/O, and multi-chip sharding over a
``jax.sharding.Mesh``.

Design: the reference's JACK-callback + mutable-globals architecture becomes
pure functions over ``(config, state, frames)`` with ``lax.scan`` across
frames; ROS topics become per-frame input timelines; per-bin C++ loops become
batched tensor ops over ``(frames, mics, bins)``.
"""

__version__ = "0.1.0"

from beamform_tpu.config import (  # noqa: F401
    ArrayConfig,
    RosjackConfig,
    load_array_config,
    load_rosjack_config,
)
from beamform_tpu.geometry import (  # noqa: F401
    ArrayGeometry,
    frequency_vector,
    steering_delays,
    steering_weights,
)
from beamform_tpu.runtime.offline import run_offline  # noqa: F401
from beamform_tpu.models import get_model, MODEL_REGISTRY  # noqa: F401
