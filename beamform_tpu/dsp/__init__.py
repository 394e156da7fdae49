from beamform_tpu.dsp.wola import (  # noqa: F401
    sqrt_hann,
    frame_signal,
    overlap_add,
    analyze,
    synthesize,
    WolaSpec,
)
