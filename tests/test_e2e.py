"""End-to-end pytest: synthetic data -> tiny judge + restorer training ->
fused eval -> cascade/demo pipelines -> interpretability export."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tsr_tpu import configs, eval as tsr_eval, interpret, pipeline
from tsr_tpu.data import synthetic
from tsr_tpu.models import ResUNet, SimpleUNet, VGG16
from tsr_tpu.ops import distortions
from tsr_tpu.train import common

TINY_CFG = (8, "M", 16, "M")
SIZE = 32


def _train_tiny_judge(imgs, labels, steps=60):
    m = VGG16(num_classes=int(labels.max()) + 1, cfg=TINY_CFG, fc_width=64)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    state = common.TrainState.create(
        m.apply, v, optax.sgd(5e-3, momentum=0.9))
    step = common.make_judge_train_step()
    n = len(imgs)
    rng = np.random.default_rng(0)
    for i in range(steps):
        idx = rng.choice(n, 32)
        state, metrics = step(state, imgs[idx], labels[idx],
                              jax.random.PRNGKey(i))
    return m, state


def test_full_chain():
    imgs, labels = synthetic.make_dataset(num_classes=5, per_class=20,
                                          size=SIZE, seed=0)
    test_imgs, test_labels = synthetic.make_dataset(
        num_classes=5, per_class=6, size=SIZE, seed=7)

    judge, jstate = _train_tiny_judge(imgs, labels)
    evalf = common.make_judge_eval_step()
    correct, _ = evalf(jstate, test_imgs, test_labels)
    clean_acc = int(correct) / len(test_labels)
    # above 20% chance: the calibrated generator (veil/smear/dark-gain
    # augmentations) is deliberately hard at 32px for a 60-step judge
    assert clean_acc > 0.25, clean_acc

    # distort
    bad = np.asarray(distortions.apply_compound_distortion(
        test_imgs, jax.random.PRNGKey(1)))

    # train a tiny unified restorer on-device
    resunet = ResUNet(widths=(4, 8, 16), bottleneck_width=16)
    rv = resunet.init(jax.random.PRNGKey(2),
                      jnp.zeros((1, SIZE, SIZE, 3)), train=True)
    rstate = common.TrainState.create(resunet.apply, rv, optax.adamw(1e-3))
    ustep = common.make_unified_train_step(configs.RandomMixConfig())
    k = jax.random.PRNGKey(3)
    for i in range(20):
        k, sub = jax.random.split(k)
        rstate, aux = ustep(rstate, imgs[:32], sub)
    assert np.isfinite(float(aux["loss"]))

    # fused restore->classify eval with metrics
    step = tsr_eval.make_fused_eval_step(
        lambda v, x: resunet.apply(v, x, train=False),
        judge.apply, with_metrics=True)
    out_bad = tsr_eval.make_fused_eval_step(None, judge.apply)(
        None, jstate.variables, bad, test_labels, None)
    out_res = step(rstate.variables, jstate.variables, bad, test_labels,
                   test_imgs)
    assert np.isfinite(np.asarray(out_res["psnr"])).all()

    # cascade pipeline with one shared tiny restorer for all three tasks
    unet = SimpleUNet(widths=(4, 8))
    uv = unet.init(jax.random.PRNGKey(4), jnp.zeros((1, SIZE, SIZE, 3)))
    res = pipeline.cascade_stress(
        test_imgs[:4], unet.apply,
        {"noise": uv, "fog": uv, "blur": uv},
        judge.apply, jstate.variables, jax.random.PRNGKey(5))
    assert len(res["stages"]) == 7
    assert set(res["mean_confidence"]) == {"clean", "distorted", "restored"}

    # unified demo
    demo = pipeline.unified_demo(
        test_imgs[:2], resunet.apply, rstate.variables,
        judge.apply, jstate.variables, jax.random.PRNGKey(6))
    assert demo["restored_u8"].shape == (2, SIZE, SIZE, 3)

    # interpretability: tap + GAP + projection + .pt export
    tap = interpret.make_tap_fn(judge.apply, tap_layer=4)
    feats = tap(jstate.variables, test_imgs[:8])
    hm = interpret.heatmap(feats)
    assert hm.shape[0] == 8 and hm.max() <= 1.0 + 1e-6
    gap = interpret.gap_features(
        tap(jstate.variables, test_imgs[:8]))
    emb = interpret.project_2d(
        np.concatenate([gap, gap + 1.0]), method="pca")
    assert emb.shape == (16, 2)


def test_embeddings_pt_schema(tmp_path):
    import torch

    emb = np.zeros((10, 2), np.float32)
    feats = np.zeros((10, 512), np.float32)
    labels = ["Clean"] * 5 + ["Noise (Bad)"] * 5
    path = str(tmp_path / "umap_embeddings.pt")
    interpret.export_embeddings_pt(path, emb, labels, feats)
    loaded = torch.load(path, weights_only=False)
    # reference schema (ref:12:145-150)
    assert set(loaded) == {"embeddings", "labels", "original_features"}
    assert loaded["embeddings"].shape == (10, 2)
    assert loaded["labels"] == labels
    assert loaded["original_features"].shape == (10, 512)


def test_profiler_trace_and_throughput(tmp_path):
    from tsr_tpu.utils import profiling, reporting

    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        _ = jnp.sum(jnp.ones((64, 64)) * 2.0)
    import os
    assert any(os.scandir(logdir))  # trace files written

    f = jax.jit(lambda x: x * 2.0)
    dt = profiling.device_time(f, jnp.ones((128, 128)), reps=2)
    assert dt > 0

    th = reporting.Throughput(warmup_batches=1)
    for _ in range(3):
        th.tick(32)
    assert th.images_per_sec > 0
