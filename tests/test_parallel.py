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


def test_model_parallel_judge_forward_tp4():
    """4-way tensor parallelism over the FC stack (data=2, model=4):
    Megatron column->row split must reproduce the replicated forward."""
    m = pmesh.make_mesh(data=2, model=4)
    judge = VGG16(num_classes=8, cfg=(8, "M", 16, "M"), fc_width=128)
    jv = judge.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    x_np = np.linspace(0, 1, 8 * 16 * 16 * 3, dtype=np.float32)
    x_np = x_np.reshape(8, 16, 16, 3)
    ref = np.asarray(judge.apply(jv, jnp.asarray(x_np)))
    jvs = pmesh.shard_variables(jv, m, pmesh.VGG_TP_RULES)
    k = jvs["params"]["classifier_0"]["kernel"]
    # 4-way split on the output (column) dim: each shard holds width/4
    widths = sorted({s.data.shape[1] for s in k.addressable_shards})
    assert widths == [128 // 4], widths
    x = pmesh.shard_batch(x_np, m)
    out = np.asarray(jax.jit(judge.apply)(jvs, x))
    assert np.allclose(out, ref, atol=1e-4)


def test_model_parallel_unified_step_tp4():
    """The unified train step under (data=2, model=4) TP sharding of the
    restorer bottleneck matches the single-device loss."""
    size, batch = 16, 8
    model = ResUNet(widths=(4, 8, 16), bottleneck_width=16)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((2, size, size, 3)), train=True)
    imgs, _ = synthetic.make_dataset(4, 2, size)
    key = jax.random.PRNGKey(5)

    def run(mesh):
        v_copy = jax.tree.map(jnp.array, v)
        state = common.TrainState.create(model.apply, v_copy,
                                         optax.adamw(1e-3))
        step = common.make_unified_train_step(configs.RandomMixConfig())
        clean = imgs[:batch]
        if mesh is not None:
            clean = pmesh.shard_batch(clean, mesh)
            state = pmesh.shard_state(state, mesh,
                                      pmesh.RESTORER_TP_RULES)
        with mesh or _nullcontext():
            state, aux = step(state, clean, key)
            return float(aux["loss"]), state

    loss1, _ = run(None)
    mesh = pmesh.make_mesh(data=2, model=4)
    loss4, s4 = run(mesh)
    assert np.isclose(loss1, loss4, rtol=1e-4), (loss1, loss4)
    spec = s4.params["bottleneck1"]["conv1"]["kernel"].sharding.spec
    assert "model" in str(spec), spec


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def test_mesh_spec_parsing():
    assert pmesh.parse_mesh_spec(None) is None
    assert pmesh.parse_mesh_spec("") is None
    assert pmesh.parse_mesh_spec("8") == {"data": 8, "model": 1}
    assert pmesh.parse_mesh_spec("data=4,model=2") == {"data": 4,
                                                       "model": 2}
    with pytest.raises(ValueError):
        pmesh.parse_mesh_spec("rows=3")
    m = pmesh.mesh_from_spec("data=4,model=2")
    assert m.devices.shape == (4, 2)


def test_shard_batch_or_replicate_uneven_tail():
    m = pmesh.make_mesh(data=8, model=1)
    even = pmesh.shard_batch_or_replicate(np.zeros((16, 4), np.float32), m)
    assert even.sharding.spec == jax.sharding.PartitionSpec("data")
    odd = pmesh.shard_batch_or_replicate(np.zeros((13, 4), np.float32), m)
    assert odd.sharding.spec == jax.sharding.PartitionSpec()


def test_mesh_wired_unified_loop_matches_single_device(tmp_path):
    """`scripts/14 --mesh data=8`-equivalent: the full train_unified loop
    on an 8-device mesh reproduces the single-device epoch losses."""
    from tsr_tpu.train import loops

    size, batch = 16, 16
    imgs, _ = synthetic.make_dataset(4, 12, size)  # 48 images
    cfg = configs.UnifiedTrainConfig(batch_size=batch, epochs=2, seed=3)

    def run(mesh):
        model = ResUNet(widths=(4, 8, 16), bottleneck_width=16)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((2, size, size, 3)), train=True)
        state = common.TrainState.create(
            model.apply, v, common.unified_optimizer(cfg, 2))
        logs = []
        loops.train_unified(
            state,
            clean_batches=lambda ep: iter([(imgs[:batch],),
                                           (imgs[batch:2 * batch],)]),
            val_clean_batches=lambda: iter([(imgs[2 * batch:2 * batch + 12],
                                             )]),  # uneven: replicated path
            cfg=cfg, vgg_apply=None, log=logs.append, mesh=mesh)
        return [ln for ln in logs if "loss" in ln]

    single = run(None)
    sharded = run(pmesh.make_mesh(data=8, model=1))

    def nums(lines):
        import re
        return [float(x) for ln in lines
                for x in re.findall(r"loss (\d+\.\d+)", ln)]

    a, b = nums(single), nums(sharded)
    assert len(a) == len(b) > 0
    np.testing.assert_allclose(a, b, rtol=2e-3)


def test_mesh_wired_judge_loop_with_model_axis():
    """train_judge on a (data=4, model=2) mesh runs and shards the FC
    kernel per VGG_TP_RULES."""
    from tsr_tpu.train import loops

    size, ncls = 16, 4
    imgs, labels = synthetic.make_dataset(ncls, 8, size)
    cfg = configs.JudgeTrainConfig(batch_size=16, epochs=1)
    judge = VGG16(num_classes=ncls, cfg=(8, "M", 16, "M"), fc_width=64)
    jv = judge.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    state = common.TrainState.create(
        judge.apply, jv, common.judge_optimizer(cfg))
    mesh = pmesh.make_mesh(data=4, model=2)
    state, acc = loops.train_judge(
        state,
        train_batches=lambda ep: iter([(imgs[:16], labels[:16])]),
        val_batches=lambda: iter([(imgs[16:26], labels[16:26])]),
        cfg=cfg, log=lambda s: None, mesh=mesh)
    k = state.params["classifier_0"]["kernel"]
    assert "model" in str(k.sharding.spec)
    assert 0.0 <= acc <= 1.0


def test_evaluate_directory_with_mesh(tmp_path):
    from tsr_tpu import eval as tsr_eval

    synthetic.write_image_tree(tmp_path / "tree", num_classes=3,
                               per_class=7, size=16)  # 21 imgs: uneven tail
    judge = VGG16(num_classes=3, cfg=(8, "M", 16, "M"), fc_width=32)
    jv = judge.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    mesh = pmesh.make_mesh(data=8, model=1)
    r1 = tsr_eval.evaluate_directory(judge.apply, jv, str(tmp_path / "tree"),
                                     batch_size=16, size=16)
    r8 = tsr_eval.evaluate_directory(judge.apply, jv, str(tmp_path / "tree"),
                                     batch_size=16, size=16, mesh=mesh)
    assert r1["n"] == r8["n"] == 21
    assert r1["top1"] == r8["top1"]


def test_distributed_helpers_single_process():
    """Multi-host helpers must behave correctly in the degenerate
    single-process case (initialize no-ops; shard = identity; global
    batch = local batch with the mesh's data sharding)."""
    import numpy as np

    from tsr_tpu.parallel import distributed

    distributed.initialize()  # must not raise single-process

    idx = np.arange(10)
    local = distributed.process_shard(idx)
    assert (local == idx).all()

    mesh = pmesh.make_mesh(data=8, model=1)
    batch = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = distributed.make_global_batch(batch, mesh)
    assert arr.shape == (16, 4)
    rows = sorted(s.data.shape[0] for s in arr.addressable_shards)
    assert rows == [2] * 8  # genuinely split over the data axis
    np.testing.assert_array_equal(np.asarray(arr), batch)
