from tsr_tpu.ops import blur, distortions, image  # noqa: F401
