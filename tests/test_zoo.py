"""Model zoo: build/load/save with architecture metadata; loop-level
training with checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tsr_tpu import configs, zoo
from tsr_tpu.data import synthetic
from tsr_tpu.train import common, loops

TINY_CFG = (8, "M", 16, "M")


def test_save_load_with_config(tmp_path):
    from tsr_tpu.models import VGG16

    judge = VGG16(num_classes=7, cfg=TINY_CFG, fc_width=32,
                  use_batchnorm=False)
    v = judge.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = common.TrainState.create(judge.apply, v, optax.sgd(1e-2))
    base = str(tmp_path / "judge")
    zoo.save_checkpoint(base, state,
                        config={"kind": "vgg16", "num_classes": 7,
                                "use_batchnorm": False,
                                "cfg": list(TINY_CFG), "fc_width": 32})
    # loader must pick num_classes from config.json, ignoring the argument
    m, lv = zoo.load_model("vgg16", base, 32, num_classes=43)
    assert m.num_classes == 7
    out = m.apply(lv, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 7)
    # restored params must equal the saved ones
    a = np.asarray(jax.tree.leaves(state.params)[0])
    b = np.asarray(jax.tree.leaves(dict(lv))[0])
    assert np.allclose(a, b)


def test_load_model_fresh_and_pth(tmp_path):
    from tsr_tpu import checkpoint as ckpt

    m, v = zoo.load_model("simple_unet", None, 32)
    out = m.apply(v, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 32, 32, 3)
    # .pth round trip through the zoo loader
    sd = ckpt.simple_unet_to_state_dict(v)
    path = str(tmp_path / "u.pth")
    ckpt.save_pth(path, sd)
    m2, v2 = zoo.load_model("simple_unet", path, 32)
    a = np.asarray(jax.tree.leaves(dict(v))[0])
    b = np.asarray(jax.tree.leaves(dict(v2))[0])
    assert np.allclose(a, b)


def test_train_resume_roundtrip(tmp_path):
    """zoo.save_checkpoint / load_train_state give true resume."""
    from tsr_tpu.models import SimpleUNet

    m = SimpleUNet(widths=(4, 8))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    state = common.TrainState.create(m.apply, v, optax.adam(1e-3))
    step = common.make_restoration_train_step(pixel="mse")
    x = np.random.default_rng(0).uniform(0, 1, (4, 16, 16, 3)
                                         ).astype(np.float32)
    for _ in range(3):
        state, _ = step(state, x, x)
    base = str(tmp_path / "ck")
    zoo.save_checkpoint(base, state)

    fresh = common.TrainState.create(
        m.apply, m.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3))),
        optax.adam(1e-3))
    resumed = zoo.load_train_state(base, fresh)
    assert int(resumed.step) == 3
    a = np.asarray(jax.tree.leaves(state.params)[0])
    b = np.asarray(jax.tree.leaves(resumed.params)[0])
    assert np.allclose(a, b)
    # optimizer moments restored too
    oa = np.asarray(jax.tree.leaves(state.opt_state)[0])
    ob = np.asarray(jax.tree.leaves(resumed.opt_state)[0])
    assert np.allclose(oa, ob)


def test_loop_train_judge_with_ckpt(tmp_path):
    from tsr_tpu.models import VGG16

    imgs, labels = synthetic.make_dataset(3, 8, 32)
    judge = VGG16(num_classes=3, cfg=TINY_CFG, fc_width=32)
    v = judge.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    cfg = configs.JudgeTrainConfig(epochs=2, batch_size=8)
    state = common.TrainState.create(judge.apply, v,
                                     common.judge_optimizer(cfg))

    def tb(epoch):
        for s in range(0, 16, 8):
            yield imgs[s:s + 8], labels[s:s + 8]

    def vb():
        yield imgs[16:24], labels[16:24]

    save = str(tmp_path / "judge")
    state, best = loops.train_judge(state, tb, vb, cfg, save_path=save,
                                    log=lambda *_: None,
                                    ckpt_config={"num_classes": 3})
    import os
    assert os.path.exists(os.path.join(save, "model"))
    assert os.path.exists(os.path.join(save, "train"))
    assert os.path.exists(os.path.join(save, "config.json"))
    assert 0.0 <= best <= 1.0


def test_process_shard_single_process():
    from tsr_tpu.parallel import distributed

    idx = np.arange(10)
    assert (distributed.process_shard(idx) == idx).all()


def test_train_judge_on_device_matches_semantics(tmp_path):
    """Scanned-epoch device-resident loop: trains, tracks best-val, writes
    the best snapshot once at the end (ref:05:115-118 semantics)."""
    from tsr_tpu.models import VGG16

    imgs, labels = synthetic.make_dataset(3, 10, 32)
    judge = VGG16(num_classes=3, cfg=TINY_CFG, fc_width=32)
    v = judge.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    cfg = configs.JudgeTrainConfig(epochs=2, batch_size=8)
    state = common.TrainState.create(judge.apply, v,
                                     common.judge_optimizer(cfg))
    tr_idx = np.arange(0, 24)
    va_idx = np.arange(24, 30)  # 6 images: exercises the masked tail
    save = str(tmp_path / "judge_dev")
    state, best = loops.train_judge_on_device(
        state, imgs, labels, tr_idx, va_idx, cfg, save_path=save,
        log=lambda *_: None, ckpt_config={"num_classes": 3})
    import os
    assert os.path.exists(os.path.join(save, "model"))
    assert 0.0 <= best <= 1.0
    assert int(state.step) == 2 * (24 // 8)


def test_train_restorer_on_device(tmp_path):
    """Scanned-epoch restorer loop: trains MSE U-Net on HBM-resident
    pairs, honors checkpoint_every + save_best."""
    from tsr_tpu.models import SimpleUNet

    rng = np.random.default_rng(0)
    clean = rng.integers(0, 256, (20, 3, 32, 32), dtype=np.uint8)
    clean = np.transpose(clean, (0, 2, 3, 1))
    bad = np.clip(clean.astype(np.int16)
                  + rng.integers(-20, 20, clean.shape), 0, 255
                  ).astype(np.uint8)
    model = SimpleUNet(widths=(4, 8))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    cfg = configs.RestorationTrainConfig(epochs=2, batch_size=8)
    state = common.TrainState.create(model.apply, v,
                                     common.restoration_optimizer(cfg))
    save = str(tmp_path / "rest_dev")
    losses_seen = []
    state = loops.train_restorer_on_device(
        state, bad, clean, np.arange(14), np.arange(14, 20),
        epochs=2, batch_size=8, pixel="mse", perceptual_weight=0.0,
        save_path=save, save_best=True,
        log=lambda s: losses_seen.append(s))
    import os
    assert os.path.exists(os.path.join(save, "model"))
    assert int(state.step) == 2 * 1  # 14 // 8 = 1 step/epoch


def test_train_unified_on_device(tmp_path):
    """Scanned-epoch unified loop: on-device random-mix generation inside
    the scan, best-val snapshot at end."""
    from tsr_tpu.models import ResUNet

    rng = np.random.default_rng(0)
    clean = rng.integers(0, 256, (20, 32, 32, 3), dtype=np.uint8)
    model = ResUNet(widths=(4, 8, 8), bottleneck_width=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   train=True)
    mix = configs.RandomMixConfig(blur_degree=(3, 5))
    cfg = configs.UnifiedTrainConfig(epochs=2, batch_size=8, mix=mix)
    state = common.TrainState.create(
        model.apply, v, common.unified_optimizer(cfg, 1))
    save = str(tmp_path / "uni_dev")
    state = loops.train_unified_on_device(
        state, clean, np.arange(16), np.arange(16, 20), cfg,
        save_path=save, log=lambda *_: None)
    import os
    assert os.path.exists(os.path.join(save, "model"))
    assert int(state.step) == 2 * 2  # 16 // 8 = 2 steps/epoch


def test_simple_unet_input_minmax_config_roundtrip(tmp_path):
    """A checkpoint saved with input_minmax=True rebuilds the stretch on
    load — no caller plumbing (eval/infer/cascade all load through
    zoo.load_model)."""
    import jax

    m, v = zoo.build_simple_unet(size=16, input_minmax=True)
    state = common.TrainState.create(m.apply, v, optax.sgd(0.1))
    base = str(tmp_path / "fog_minmax")
    zoo.save_checkpoint(base, state, config={"input_minmax": True})

    m2, v2 = zoo.load_model("simple_unet", base, 16)
    assert m2.input_minmax is True
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3),
                           minval=0.6, maxval=0.9)  # compressed-range input
    got = np.asarray(m2.apply(v2, x))
    plain = np.asarray(m.apply(v, (x - x.min(axis=(1, 2, 3), keepdims=True))
                               / (x.max(axis=(1, 2, 3), keepdims=True)
                                  - x.min(axis=(1, 2, 3), keepdims=True))))
    np.testing.assert_allclose(got, plain, atol=1e-6)
