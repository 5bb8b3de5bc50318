"""ImageNet-readiness harness (VERDICT r2 task 6).

The single largest forced deviation from the reference is the missing
ImageNet-pretrained VGG16 (torchvision weights are unobtainable offline —
zero egress). These tests prove that the moment a torchvision-format
``vgg16-imagenet.pth`` is available, the full reference path needs NO new
code:

  (a) ``checkpoint.vgg16_from_pth`` imports the stock 1000-class
      checkpoint and performs the reference's head swap
      ``classifier[6] -> Linear(4096, num_classes)`` (ref:05:54);
  (b) the exact ref:05 recipe — SGD(lr=1e-3, momentum=0.9), CE loss
      (ref:05:47-60) — runs on the imported weights;
  (c) the perceptual loss (frozen features[:16] on UN-normalized input,
      ref:07adv:102-112) and the scripts-11/12 feature taps (relu1_2,
      final pool + GAP, ref:11:31-44, ref:12:37-58) re-derive from them.

The wiring layer runs today against a synthetic torchvision-format state
dict with the real torchvision shapes (1000-class head). The convergence
assert is gated on ``TSR_IMAGENET_PTH=/path/to/vgg16-imagenet.pth``:

    TSR_IMAGENET_PTH=~/vgg16-397923af.pth python -m pytest \
        tests/test_imagenet_ready.py -q

CLI path for the day weights arrive (documented, nothing to write):
    python scripts/05_train_baseline.py --init-pth vgg16-imagenet.pth
    python scripts/07_train_restoration_advanced.py --judge vgg16-imagenet.pth
    python scripts/14_train_unified_advanced.py --judge vgg16-imagenet.pth
    python scripts/11_visualize_hidden_states.py --model vgg16-imagenet.pth
    python scripts/12_generate_umap_pt.py --model vgg16-imagenet.pth
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsr_tpu import checkpoint as ckpt
from tsr_tpu import configs, interpret, losses, zoo
from tsr_tpu.models.vgg import (GAP_TAP, HIDDEN_STATE_TAP, PERCEPTUAL_TAP,
                                VGG16_CFG)
from tsr_tpu.ops import image as image_ops
from tsr_tpu.train import common

# torchvision vgg16 feature-module conv indices (must match VGG16_CFG).
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def _fake_imagenet_sd(seed=0):
    """Torchvision-format VGG16 state dict: real shapes, random weights,
    the stock 1000-class ImageNet head."""
    rng = np.random.default_rng(seed)

    def t(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = {}
    in_ch = 3
    widths = [v for v in VGG16_CFG if v != "M"]
    for idx, w in zip(_CONV_IDX, widths):
        sd[f"features.{idx}.weight"] = t(w, in_ch, 3, 3)
        sd[f"features.{idx}.bias"] = t(w)
        in_ch = w
    sd["classifier.0.weight"] = t(4096, 512 * 7 * 7)
    sd["classifier.0.bias"] = t(4096)
    sd["classifier.3.weight"] = t(4096, 4096)
    sd["classifier.3.bias"] = t(4096)
    sd["classifier.6.weight"] = t(1000, 4096)  # ImageNet head
    sd["classifier.6.bias"] = t(1000)
    return sd


@pytest.fixture(scope="module")
def imagenet_pth(tmp_path_factory):
    """Path to a torchvision-format .pth: the real one if TSR_IMAGENET_PTH
    is set, else the synthetic stand-in."""
    real = os.environ.get("TSR_IMAGENET_PTH")
    if real:
        return real
    p = tmp_path_factory.mktemp("pth") / "vgg16-imagenet.pth"
    ckpt.save_pth(str(p), _fake_imagenet_sd())
    return str(p)


def test_import_and_head_swap(imagenet_pth):
    sd = ckpt.load_pth(imagenet_pth)
    assert sd["classifier.6.weight"].shape[0] in (1000, 43)
    v = ckpt.vgg16_from_pth(sd, num_classes=43)
    # features copied exactly (kernel layout OIHW -> HWIO)
    w0 = np.asarray(v["params"]["features_0"]["kernel"])
    assert w0.shape == (3, 3, 3, 64)
    np.testing.assert_allclose(
        w0, np.transpose(sd["features.0.weight"], (2, 3, 1, 0)))
    # the reference's head swap (ref:05:54): fresh 43-wide Linear
    head = v["params"]["classifier_6"]
    assert np.asarray(head["kernel"]).shape == (4096, 43)
    if sd["classifier.6.weight"].shape[0] == 1000:
        bound = 1.0 / np.sqrt(4096)
        assert np.abs(np.asarray(head["kernel"])).max() <= bound
    # classifier.0/.3 copied verbatim
    np.testing.assert_allclose(
        np.asarray(v["params"]["classifier_0"]["kernel"]),
        sd["classifier.0.weight"].T)


def test_ref05_recipe_runs_on_imported_weights(imagenet_pth):
    """Two steps of the exact ref:05 SGD recipe on the imported weights."""
    judge, variables = zoo.load_model("vgg16", imagenet_pth, 224,
                                      num_classes=43)
    cfg = configs.JudgeTrainConfig()  # SGD 1e-3 mom 0.9 — ref:05:60 default
    assert cfg.optimizer == "sgd" and cfg.learning_rate == 1e-3
    state = common.TrainState.create(
        judge.apply, variables, common.judge_optimizer(cfg))
    step = common.make_judge_train_step()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
    labels = jnp.asarray([3, 40])
    losses_seen = []
    for i in range(2):
        state, m = step(state, jnp.asarray(imgs), labels,
                        jax.random.PRNGKey(i))
        losses_seen.append(float(m["loss"]))
    assert all(np.isfinite(x) for x in losses_seen), losses_seen
    assert losses_seen[0] != losses_seen[1]  # SGD actually moved the params


def test_perceptual_and_tap_features_from_imported_weights(imagenet_pth):
    """Perceptual loss + scripts 11/12 taps re-derive from the .pth."""
    judge, variables = zoo.load_model("vgg16", imagenet_pth, 224,
                                      num_classes=43)
    x = image_ops.to_float01(jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (2, 224, 224, 3),
                                          dtype=np.uint8)))

    # ref:07adv perceptual: frozen features[:16], UN-normalized [0,1] input
    def vgg_apply(x01):
        return judge.apply(variables, x01, train=False,
                           tap_layer=PERCEPTUAL_TAP)

    feats = jax.jit(vgg_apply)(x)
    assert feats.shape == (2, 56, 56, 256)  # relu3_3: 2 pools before tap 15
    loss, _ = losses.restoration_loss(
        x, x * 0.5,
        perceptual=lambda a, b: jnp.mean((vgg_apply(a) - vgg_apply(b)) ** 2),
        pixel="l1")
    assert np.isfinite(float(loss))

    # ref:11 relu1_2 heatmap tap
    tap = interpret.make_tap_fn(judge.apply, tap_layer=HIDDEN_STATE_TAP)
    h = tap(variables, np.asarray(x * 255, np.uint8))
    assert h.shape == (2, 224, 224, 64)
    hm = interpret.heatmap(h)
    assert hm.shape == (2, 224, 224) and np.isfinite(hm).all()

    # ref:12 final-pool GAP features
    tap30 = interpret.make_tap_fn(judge.apply, tap_layer=GAP_TAP)
    f30 = tap30(variables, np.asarray(x * 255, np.uint8))
    assert f30.shape == (2, 7, 7, 512)
    gap = interpret.gap_features(f30)
    assert gap.shape == (2, 512)


@pytest.mark.skipif(not os.environ.get("TSR_IMAGENET_PTH"),
                    reason="needs the real ImageNet VGG16 .pth "
                           "(set TSR_IMAGENET_PTH)")
def test_ref05_recipe_converges_with_imagenet_init(imagenet_pth, tmp_path):
    """With real ImageNet weights, the untouched ref:05 recipe (SGD 1e-3,
    10 epochs) must converge on the stand-in tree — the assert the
    from-scratch ablation shows fails without pretrained init."""
    from tsr_tpu.data import gtsrb, synthetic
    from tsr_tpu.train import loops

    tree = tmp_path / "clean"
    synthetic.write_image_tree(str(tree), num_classes=10, per_class=30,
                               size=72, seed=0, size_jitter=0.45)
    ds = gtsrb.ImageFolder(str(tree), size=224)
    judge, variables = zoo.load_model("vgg16", imagenet_pth, 224,
                                      num_classes=len(ds.classes))
    cfg = configs.JudgeTrainConfig()  # the exact ref recipe
    state = common.TrainState.create(
        judge.apply, variables, common.judge_optimizer(cfg))
    tr, va = gtsrb.train_val_split(len(ds), cfg.train_split, cfg.seed)
    images, labels = ds.load_batch(range(len(ds)))
    _, best_val = loops.train_judge_on_device(
        state, images, labels, tr, va, cfg)
    assert best_val >= 0.9, best_val
