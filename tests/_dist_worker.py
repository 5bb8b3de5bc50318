"""Subprocess worker for tests/test_distributed.py: one process of a
2-process CPU 'multi-host' run.

Exercises the real DCN code path (SURVEY.md §5 mapping) end to end:
``parallel.distributed.initialize`` (gRPC coordinator on localhost),
``process_shard`` + ``make_global_batch`` (per-process feeding of a
globally-sharded batch), and one mesh-sharded restoration train step whose
gradient reduction crosses the process boundary via gloo CPU collectives.

Prints ``DIST_LOSS <value>`` on success; the parent asserts both processes
report the identical loss and that it matches a single-process run of the
same step on the same data.
"""

import sys

import jax

# Fresh interpreter: sitecustomize force-registers the axon TPU plugin and
# overrides JAX_PLATFORMS via jax.config — force CPU back before any
# backend initializes (same dance as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402

from tsr_tpu import configs  # noqa: E402
from tsr_tpu.parallel import distributed, mesh as pmesh  # noqa: E402


def main():
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    distributed.initialize(coordinator=coordinator, num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp

    from tsr_tpu.models import SimpleUNet
    from tsr_tpu.train import common

    # Deterministic global batch; each process decodes/feeds only its own
    # slice, as a real multi-host input pipeline would (gtsrb.batches over
    # process_shard(indices)).
    rng = np.random.default_rng(0)
    bad = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    clean = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)

    mesh = pmesh.make_mesh(data=-1, model=1)  # 4-device global data mesh
    local = distributed.process_shard(np.arange(8))
    assert len(local) == 4
    gbad = distributed.make_global_batch(bad[local], mesh)
    gclean = distributed.make_global_batch(clean[local], mesh)
    assert gbad.shape == (8, 32, 32, 3), gbad.shape
    # each process holds only its local shard rows
    held = sum(s.data.shape[0] for s in gbad.addressable_shards)
    assert held == 4, held

    model = SimpleUNet(widths=(4, 8))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = common.TrainState.create(
        model.apply, v,
        common.restoration_optimizer(configs.RestorationTrainConfig()))
    state = pmesh.shard_state(state, mesh)  # pure DP: replicate params
    step = common.make_restoration_train_step(pixel="mse")
    with mesh:
        state, aux = step(state, gbad, gclean)
        loss = float(aux["loss"])  # replicated scalar: fetchable anywhere
    print(f"DIST_LOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
