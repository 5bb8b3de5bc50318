"""Epoch loops for the four training paths.

These mirror the reference scripts' behavior — best-metric checkpointing
(ref:05:115-118, ref:14:265-267), periodic checkpointing (ref:07:177-178) —
while adding what the reference lacks: optimizer state in checkpoints (true
resume), throughput counters, and a single implementation instead of four
copy-pasted loops.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from tsr_tpu import checkpoint as ckpt  # noqa: F401 (re-export for tests)
from tsr_tpu import configs
from tsr_tpu.train import common


def _epoch_mean(vals):
    return float(np.mean(vals)) if vals else float("nan")


def _mesh_feeders(state, mesh, tp_rules=()):
    """Returns (state, train_feed, val_feed).

    With a mesh, the state is placed on it (params/opt per ``tp_rules``,
    rest replicated) and batches are sharded over the data axis — train
    batches strictly (drop_remainder keeps them full-size; the global
    batch must divide by the data axis), validation batches with a
    replicated fallback for the uneven tail. XLA then inserts the
    gradient/batch-stat collectives under jit; the step functions are
    unchanged (SURVEY.md §5 mapping)."""
    if mesh is None:
        ident = lambda b: b  # noqa: E731
        return state, ident, ident
    from tsr_tpu.parallel import mesh as pmesh

    state = pmesh.shard_state(state, mesh, tp_rules)
    data = mesh.shape[mesh.axis_names[0]]

    def train_feed(b):
        n = jax.tree.leaves(b)[0].shape[0]
        if n % data != 0:
            raise ValueError(
                f"global batch {n} not divisible by mesh data axis {data}")
        return pmesh.shard_batch(b, mesh)

    return state, train_feed, (
        lambda b: pmesh.shard_batch_or_replicate(b, mesh))


def _save_ckpt(save_path, state, config=None):
    from tsr_tpu import zoo

    zoo.save_checkpoint(save_path, state, config=config)


def train_judge(
    state: common.TrainState,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[], Iterable],
    cfg: configs.JudgeTrainConfig,
    save_path: Optional[str] = None,
    log: Callable[[str], None] = print,
    ckpt_config: Optional[dict] = None,
    mesh=None,
):
    """Judge fine-tune loop (ref:05:65-118). ``train_batches(epoch)`` and
    ``val_batches()`` yield (images_u8, labels) numpy batches. ``mesh``
    shards the loop over devices (data-parallel batches + Megatron TP on
    the 4096-wide FC layers when the mesh has a model axis)."""
    from tsr_tpu.parallel import mesh as pmesh

    state, tfeed, vfeed = _mesh_feeders(
        state, mesh,
        pmesh.VGG_TP_RULES if mesh is not None
        and mesh.shape.get("model", 1) > 1 else ())
    step_fn = common.make_judge_train_step(cfg.label_smoothing)
    eval_fn = common.make_judge_eval_step()
    rng = jax.random.PRNGKey(cfg.seed)
    best_acc = 0.0
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        losses_, accs, n_img = [], [], 0
        for images, labels in train_batches(epoch):
            rng, dr = jax.random.split(rng)
            images, labels = tfeed((images, labels))
            state, metrics = step_fn(state, images, labels, dr)
            losses_.append(float(metrics["loss"]))
            accs.append(float(metrics["accuracy"]))
            n_img += len(labels)
        dt = time.perf_counter() - t0
        log(f"Epoch {epoch + 1}/{cfg.epochs} train loss "
            f"{_epoch_mean(losses_):.4f} acc {_epoch_mean(accs):.4f} "
            f"({n_img / max(dt, 1e-9):.1f} img/s)")

        correct = total = 0
        for images, labels in val_batches():
            images, labels = vfeed((images, labels))
            c, _ = eval_fn(state, images, labels)
            correct += int(c)
            total += len(labels)
        val_acc = correct / max(total, 1)
        log(f"  val acc {val_acc:.4f}")
        if val_acc > best_acc and save_path:
            best_acc = val_acc
            _save_ckpt(save_path, state, ckpt_config)
            log(f"  saved best (val acc {best_acc:.4f})")
    return state, best_acc


def train_restorer(
    state: common.TrainState,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[], Iterable],
    epochs: int,
    step_fn,
    eval_fn,
    save_path: Optional[str] = None,
    checkpoint_every: int = 0,
    save_best: bool = False,
    log: Callable[[str], None] = print,
    batch_to_float: bool = False,
    ckpt_config: Optional[dict] = None,
    mesh=None,
):
    """Shared restorer loop for the specialized/advanced paths (ref:07
    trains on precomputed (bad, clean) pairs, saving every N epochs;
    ref:14-style best-val saving via ``save_best``).

    Batches are fed as uint8 and converted on device (the steps handle
    both dtypes); ``batch_to_float=True`` keeps the old host-side
    conversion (4x the host->device bytes). ``mesh`` shards the loop
    (data-parallel batches; bottleneck-channel TP with a model axis)."""
    from tsr_tpu.parallel import mesh as pmesh

    state, tfeed, vfeed = _mesh_feeders(
        state, mesh,
        pmesh.RESTORER_TP_RULES if mesh is not None
        and mesh.shape.get("model", 1) > 1 else ())
    best_loss = float("inf")
    for epoch in range(epochs):
        t0 = time.perf_counter()
        losses_, n_img = [], 0
        for bad, clean in train_batches(epoch):
            if batch_to_float:
                bad = bad.astype(np.float32) / 255.0
                clean = clean.astype(np.float32) / 255.0
            bad, clean = tfeed((bad, clean))
            state, aux = step_fn(state, bad, clean)
            losses_.append(float(aux["loss"]))
            n_img += len(bad)
        dt = time.perf_counter() - t0
        log(f"Epoch {epoch + 1}/{epochs} train loss "
            f"{_epoch_mean(losses_):.6f} ({n_img / max(dt, 1e-9):.1f} img/s)")

        vlosses = []
        for bad, clean in val_batches():
            if batch_to_float:
                bad = bad.astype(np.float32) / 255.0
                clean = clean.astype(np.float32) / 255.0
            bad, clean = vfeed((bad, clean))
            aux = eval_fn(state, bad, clean)
            vlosses.append(float(aux["loss"]))
        vl = _epoch_mean(vlosses)
        log(f"  val loss {vl:.6f}")

        if save_path:
            if checkpoint_every and (epoch + 1) % checkpoint_every == 0:
                _save_ckpt(save_path, state, ckpt_config)
            if save_best and vl < best_loss:
                best_loss = vl
                _save_ckpt(save_path, state, ckpt_config)
                log("  saved best (val loss)")
    if save_path and not save_best:
        _save_ckpt(save_path, state, ckpt_config)
    return state


def train_unified(
    state: common.TrainState,
    clean_batches: Callable[[int], Iterable],
    val_clean_batches: Callable[[], Iterable],
    cfg: configs.UnifiedTrainConfig,
    vgg_apply=None,
    save_path: Optional[str] = None,
    log: Callable[[str], None] = print,
    ckpt_config: Optional[dict] = None,
    mesh=None,
):
    """Unified ResUNet loop (ref:14:227-267) with on-device distortion.

    ``clean_batches(epoch)`` yields clean uint8 [B,H,W,3] batches; the
    distorted twin is generated inside the jitted step. ``mesh`` shards
    the loop: clean batches split over the data axis, so each device
    generates its own distorted shard on-device; BatchNorm and gradient
    reductions become ICI collectives automatically."""
    from tsr_tpu.ops import distortions
    from tsr_tpu.parallel import mesh as pmesh

    state, tfeed, vfeed = _mesh_feeders(
        state, mesh,
        pmesh.RESTORER_TP_RULES if mesh is not None
        and mesh.shape.get("model", 1) > 1 else ())
    step_fn = common.make_unified_train_step(
        cfg.mix, cfg.perceptual_weight, vgg_apply)
    eval_fn = common.make_restoration_eval_step(
        pixel="l1", perceptual_weight=cfg.perceptual_weight,
        vgg_apply=vgg_apply)
    rng = jax.random.PRNGKey(cfg.seed)
    best_loss = float("inf")
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        losses_, n_img = [], 0
        for (clean,) in clean_batches(epoch):
            rng, k = jax.random.split(rng)
            (clean,) = tfeed((clean,))
            state, aux = step_fn(state, clean, k)
            losses_.append(float(aux["loss"]))
            n_img += len(clean)
        dt = time.perf_counter() - t0
        log(f"Epoch {epoch + 1}/{cfg.epochs} train loss "
            f"{_epoch_mean(losses_):.5f} ({n_img / max(dt, 1e-9):.1f} img/s)")

        vlosses = []
        for (clean,) in val_clean_batches():
            rng, k = jax.random.split(rng)
            (clean,) = vfeed((clean,))
            bad01, clean01 = distortions.make_training_pair(clean, k, cfg.mix)
            aux = eval_fn(state, bad01, clean01)
            vlosses.append(float(aux["loss"]))
        vl = _epoch_mean(vlosses)
        log(f"  val loss {vl:.5f}")
        if save_path and vl < best_loss:
            best_loss = vl
            _save_ckpt(save_path, state, ckpt_config)
            log("  saved best (val loss)")
    return state


def state_to_tree(state: common.TrainState):
    """Serialize a TrainState to a plain pytree for orbax."""
    tree = {"step": state.step, "params": state.params,
            "opt_state": state.opt_state}
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    return jax.tree.map(np.asarray, tree)


def tree_to_state(tree, template: common.TrainState) -> common.TrainState:
    return template.replace(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree.get("batch_stats", template.batch_stats),
        opt_state=tree["opt_state"],
    )
