"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tsr_tpu import configs
from tsr_tpu.data import synthetic
from tsr_tpu.models import ResUNet, VGG16
from tsr_tpu.parallel import mesh as pmesh
from tsr_tpu.train import common


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = pmesh.make_mesh(data=-1, model=2)
    assert m.devices.shape == (4, 2)
    m1 = pmesh.make_mesh(data=8, model=1)
    assert m1.devices.shape == (8, 1)


def test_sharded_batch_and_params():
    m = pmesh.make_mesh(data=4, model=2)
    x = np.zeros((8, 16, 16, 3), np.float32)
    xs = pmesh.shard_batch(x, m)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data")

    judge = VGG16(num_classes=4, cfg=(8, "M", 16, "M"), fc_width=64)
    jv = judge.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sharded = pmesh.shard_variables(jv, m, pmesh.VGG_TP_RULES)
    k = sharded["params"]["classifier_0"]["kernel"]
    assert k.sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_data_parallel_unified_step_matches_single_device():
    """The sharded unified train step must produce the same loss as the
    unsharded one (global batch stats, global gradient mean)."""
    size, batch = 16, 16
    model = ResUNet(widths=(4, 8, 16), bottleneck_width=16)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((2, size, size, 3)), train=True)
    imgs, _ = synthetic.make_dataset(4, 4, size)
    key = jax.random.PRNGKey(1)

    def run(shard):
        # fresh buffers: the donated train step invalidates the previous
        # run's state, which shares v's arrays
        v_copy = jax.tree.map(jnp.array, v)
        state = common.TrainState.create(model.apply, v_copy,
                                         optax.adamw(1e-3))
        step = common.make_unified_train_step(configs.RandomMixConfig())
        clean = imgs[:batch]
        if shard:
            m = pmesh.make_mesh(data=8, model=1)
            clean = pmesh.shard_batch(clean, m)
            state = state.replace(
                params=pmesh.shard_variables(state.params, m),
                batch_stats=pmesh.shard_variables(state.batch_stats, m),
                opt_state=pmesh.shard_variables(state.opt_state, m),
            )
        state, aux = step(state, clean, key)
        return float(aux["loss"]), state

    loss1, s1 = run(False)
    loss8, s8 = run(True)
    assert np.isclose(loss1, loss8, rtol=1e-4), (loss1, loss8)
    # params after one step must agree
    a = np.asarray(jax.tree.leaves(s1.params)[0])
    b = np.asarray(jax.tree.leaves(s8.params)[0])
    assert np.allclose(a, b, atol=1e-5)


def test_model_parallel_judge_forward():
    m = pmesh.make_mesh(data=4, model=2)
    judge = VGG16(num_classes=8, cfg=(8, "M", 16, "M"), fc_width=128)
    jv = judge.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    ref = np.asarray(judge.apply(jv, jnp.ones((8, 16, 16, 3)) * 0.4))
    jvs = pmesh.shard_variables(jv, m, pmesh.VGG_TP_RULES)
    x = pmesh.shard_batch(np.ones((8, 16, 16, 3), np.float32) * 0.4, m)
    out = np.asarray(jax.jit(judge.apply)(jvs, x))
    assert np.allclose(out, ref, atol=1e-4)
