from beamform_tpu.utils.profiling import (  # noqa: F401
    RealTimeMonitor, xrt_report, trace_to)
