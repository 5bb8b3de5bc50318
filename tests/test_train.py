"""Training-step smoke tests: losses go down, batch stats update, the
unified step generates its batch on device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tsr_tpu import configs
from tsr_tpu.data import synthetic
from tsr_tpu.models import ResUNet, SimpleUNet, VGG16
from tsr_tpu.train import common


def _unet_state(widths=(4, 8), lr=1e-3, size=16):
    m = SimpleUNet(widths=widths)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    return common.TrainState.create(m.apply, v, optax.adam(lr))


def test_restoration_step_reduces_loss():
    state = _unet_state()
    rng = np.random.default_rng(0)
    clean = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    bad = np.clip(clean + rng.normal(0, 0.1, clean.shape), 0, 1
                  ).astype(np.float32)
    step = common.make_restoration_train_step(pixel="mse")
    first = None
    for i in range(30):
        state, aux = step(state, bad, clean)
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < first


def test_unified_step_on_device_generation():
    m = ResUNet(widths=(4, 8, 16), bottleneck_width=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=True)
    state = common.TrainState.create(m.apply, v, optax.adamw(1e-3))
    imgs, _ = synthetic.make_dataset(num_classes=4, per_class=2, size=32)
    step = common.make_unified_train_step(configs.RandomMixConfig())
    key = jax.random.PRNGKey(0)
    # materialize before the donated call invalidates the old buffers
    bs0 = jax.tree.map(np.asarray, state.batch_stats)
    state, aux = step(state, imgs, key)
    assert np.isfinite(float(aux["loss"]))
    # batch stats must have been updated
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), bs0, state.batch_stats)
    assert max(jax.tree.leaves(diff)) > 0


TINY_CFG = (8, "M", 16, "M")  # taps: conv0,relu1,pool2,conv3,relu4,pool5


def test_judge_step_and_eval():
    m = VGG16(num_classes=4, cfg=TINY_CFG, fc_width=32)
    x0 = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x0)
    state = common.TrainState.create(m.apply, v, optax.sgd(1e-2, momentum=0.9))
    imgs, labels = synthetic.make_dataset(num_classes=4, per_class=4, size=32)
    step = common.make_judge_train_step()
    evalf = common.make_judge_eval_step()
    first = None
    for i in range(5):
        state, metrics = step(state, imgs, labels, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    correct, logits = evalf(state, imgs, labels)
    assert logits.shape == (len(labels), 4)
    assert 0 <= int(correct) <= len(labels)


def test_perceptual_step():
    judge = VGG16(num_classes=4, cfg=TINY_CFG, fc_width=32)
    jv = judge.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))

    def vgg_apply(x01):
        return judge.apply(jv, x01, train=False, tap_layer=4)

    state = _unet_state()
    rng = np.random.default_rng(0)
    clean = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
    bad = np.clip(clean + rng.normal(0, 0.1, clean.shape), 0, 1
                  ).astype(np.float32)
    step = common.make_restoration_train_step(
        pixel="l1", perceptual_weight=0.1, vgg_apply=vgg_apply)
    state, aux = step(state, bad, clean)
    assert "perceptual_loss" in aux and np.isfinite(float(aux["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    from tsr_tpu import checkpoint as ckpt
    from tsr_tpu.train import loops

    state = _unet_state()
    rng = np.random.default_rng(0)
    clean = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
    step = common.make_restoration_train_step(pixel="mse")
    state, _ = step(state, clean, clean)
    tree = loops.state_to_tree(state)
    path = str(tmp_path / "ck")
    ckpt.save_train_state(path, tree)
    fresh = _unet_state()
    restored_tree = ckpt.restore_train_state(
        path, loops.state_to_tree(fresh))
    restored = loops.tree_to_state(restored_tree, fresh)
    assert int(restored.step) == int(state.step)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_unified_step_with_remat():
    """jax.checkpoint (remat) variant compiles and matches the plain step's
    loss for identical inputs."""
    m = ResUNet(widths=(4, 8, 16), bottleneck_width=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=True)
    imgs, _ = synthetic.make_dataset(num_classes=4, per_class=2, size=32)
    key = jax.random.PRNGKey(0)

    # tiny frozen VGG-ish feature fn so the "vgg" placement has a branch
    # to checkpoint
    import flax.linen as nn
    feat = nn.Conv(4, (3, 3))
    fv = feat.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    vgg_apply = lambda x: feat.apply(fv, x)  # noqa: E731

    losses = []
    for remat in (False, True, "vgg"):
        v_copy = jax.tree.map(jnp.array, v)
        state = common.TrainState.create(m.apply, v_copy, optax.adamw(1e-3))
        step = common.make_unified_train_step(
            configs.RandomMixConfig(), perceptual_weight=0.1,
            vgg_apply=vgg_apply, remat=remat)
        state, aux = step(state, imgs, key)
        losses.append(float(aux["loss"]))
    assert np.isclose(losses[0], losses[1], rtol=1e-5), losses
    assert np.isclose(losses[0], losses[2], rtol=1e-5), losses


def test_val_wrap_pad_tiny_val_sets():
    """Wrap-pad must be exact even when the pad exceeds the val set
    (regression: 1-2 val samples at batch 4 crashed the reshape)."""
    import numpy as np

    from tsr_tpu.train.loops import _val_wrap_pad

    for n, bs in ((1, 4), (2, 4), (3, 8), (5, 4), (8, 4), (7, 3)):
        va = np.arange(100, 100 + n)
        idx, mask = _val_wrap_pad(va, bs)
        vsteps = max(1, -(-n // bs))
        assert idx.shape == mask.shape == (vsteps, bs)
        assert mask.sum() == n  # each real sample weighted exactly once
        flat_idx, flat_mask = idx.ravel(), mask.ravel()
        # the mask-1 slots cover the val set exactly once
        assert sorted(flat_idx[flat_mask == 1].tolist()) == va.tolist()
        # padded slots still index valid samples (wrapped)
        assert set(flat_idx.tolist()) <= set(va.tolist())

    import pytest

    with pytest.raises(ValueError):
        _val_wrap_pad(np.array([], np.int32), 4)


def test_train_restorer_periodic_does_not_clobber_best(tmp_path):
    """checkpoint_every + save_best share one save_path: the best state
    must be re-written last, and the retained best snapshot must survive
    donated train-step buffers (a bare reference would be deleted)."""
    from tsr_tpu import zoo
    from tsr_tpu.train import loops

    state = _unet_state()
    rng = np.random.default_rng(0)
    clean = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    bad = np.clip(clean.astype(int)
                  + rng.integers(-40, 40, clean.shape), 0, 255
                  ).astype(np.uint8)
    step = common.make_restoration_train_step(pixel="mse")
    ev = common.make_restoration_eval_step(pixel="mse")
    sp = str(tmp_path / "ck")
    seen = []
    loops.train_restorer(
        state, lambda e: [(bad, clean)], lambda: [(bad, clean)],
        4, step, ev, save_path=sp, checkpoint_every=1, save_best=True,
        log=seen.append)
    # the final write is the best re-write (logged after the epoch loop)
    assert any(s.startswith("saved best checkpoint") for s in seen[-1:])
    m, mv = zoo.load_model("simple_unet", sp, 16)
    assert jax.tree.leaves(mv)  # loads and is non-empty
