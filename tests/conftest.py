"""Test configuration: run the suite on a virtual 8-device CPU mesh so
multi-device sharding paths are exercised without TPU hardware.

Note: this environment's sitecustomize registers the 'axon' TPU plugin and
calls ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter
start, which overrides the JAX_PLATFORMS env var — so the platform must be
forced back via config here, before any backend initializes.
"""

import os

if os.environ.get("TSR_TEST_TPU"):
    # opt-in: run on the real chip (for the TPU-PRNG-only tests, e.g.
    # test_fused_noise_statistics, and for recording on-device parity runs)
    import jax
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

from tsr_tpu.utils import profiling  # noqa: E402

profiling.enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
