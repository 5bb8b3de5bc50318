from tsr_tpu.utils import reporting  # noqa: F401
