from tsr_tpu.kernels import distort  # noqa: F401
