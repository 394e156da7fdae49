from beamform_tpu.kernels.mxu_fft import rfft_mxu, irfft_mxu  # noqa: F401
