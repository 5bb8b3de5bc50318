from tsr_tpu.data import gtsrb, synthetic  # noqa: F401
