"""Epoch loops for the four training paths.

These mirror the reference scripts' behavior — best-metric checkpointing
(ref:05:115-118, ref:14:265-267), periodic checkpointing (ref:07:177-178) —
while adding what the reference lacks: optimizer state in checkpoints (true
resume), throughput counters, and a single implementation instead of four
copy-pasted loops.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from tsr_tpu import checkpoint as ckpt  # noqa: F401 (re-export for tests)
from tsr_tpu import configs
from tsr_tpu.ops import image as image_ops
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


def train_judge_on_device(
    state: common.TrainState,
    images_u8: np.ndarray,
    labels: np.ndarray,
    tr_idx: np.ndarray,
    va_idx: np.ndarray,
    cfg: configs.JudgeTrainConfig,
    save_path: Optional[str] = None,
    log: Callable[[str], None] = print,
    ckpt_config: Optional[dict] = None,
):
    """Judge training with the whole dataset resident in HBM.

    Same recipe as :func:`train_judge` (ref:05:65-118) but TPU-shaped for a
    remote chip: the dataset is uploaded ONCE, each epoch is a single jitted
    ``lax.scan`` over steps (batches gathered on-device from a fresh
    permutation), and validation is a second scanned graph — so an epoch
    costs one dispatch + three scalar fetches instead of per-step
    host->device uploads and blocking metric reads (which cap the streamed
    loop at ~200 img/s through a ~30 ms-RTT relay). The best-val state is
    snapshotted on-device and written to disk once at the end, preserving
    the reference's best-val-checkpoint semantics (ref:05:115-118).

    Use when ``images_u8`` fits in HBM (a 224px uint8 tree is ~150 KB/img;
    GTSRB-scale ~40k images = 6 GB — fits v5e's 16 GB). Otherwise fall back
    to :func:`train_judge`.
    """
    import jax.numpy as jnp

    bs = cfg.batch_size
    x_all = jax.device_put(np.ascontiguousarray(images_u8))
    y_all = jax.device_put(np.asarray(labels, np.int32))
    tr_idx = np.asarray(tr_idx, np.int32)
    steps = len(tr_idx) // bs
    if steps == 0:
        raise ValueError(f"fewer than one batch: {len(tr_idx)} < {bs}")

    # validation: pad to a batch multiple, mask the tail
    n_val = len(va_idx)
    va_pad, va_mask = _val_wrap_pad(va_idx, bs)
    va_pad_d = jax.device_put(va_pad)
    va_mask_d = jax.device_put(va_mask)

    step_fn = common.make_judge_train_step(cfg.label_smoothing, jit=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(st, x, y, idx, rng):
        perm = jax.random.permutation(rng, idx)[:steps * bs]
        perm = perm.reshape(steps, bs)

        def body(carry, batch_idx):
            st, rng = carry
            rng, dr = jax.random.split(rng)
            xb = jnp.take(x, batch_idx, axis=0)
            yb = jnp.take(y, batch_idx, axis=0)
            st, m = step_fn(st, xb, yb, dr)
            return (st, rng), (m["loss"], m["accuracy"])

        (st, _), (ls, accs) = jax.lax.scan(body, (st, rng), perm)
        return st, jnp.mean(ls), jnp.mean(accs)

    @jax.jit
    def val_fn(st, x, y, idxs, masks):
        def body(tot, args):
            idx, mask = args
            xb = jnp.take(x, idx, axis=0)
            yb = jnp.take(y, idx, axis=0)
            xn = image_ops.imagenet_normalize(image_ops.to_float01(xb))
            logits = st.apply_fn(st.variables, xn, train=False)
            hit = (jnp.argmax(logits, -1) == yb).astype(jnp.float32)
            return tot + jnp.sum(hit * mask), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), (idxs, masks))
        return tot

    snapshot = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    rng = jax.random.PRNGKey(cfg.seed)
    idx_d = jax.device_put(tr_idx)
    best_acc, best_state = 0.0, None
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        rng, er = jax.random.split(rng)
        state, mloss, macc = epoch_fn(state, x_all, y_all, idx_d, er)
        val_acc = float(val_fn(state, x_all, y_all,
                               va_pad_d, va_mask_d)) / max(n_val, 1)
        dt = time.perf_counter() - t0
        log(f"Epoch {epoch + 1}/{cfg.epochs} train loss {float(mloss):.4f} "
            f"acc {float(macc):.4f} ({steps * bs / max(dt, 1e-9):.1f} img/s)")
        log(f"  val acc {val_acc:.4f}")
        if val_acc >= best_acc:
            # >= : on ties keep the LATEST state. The reference's strict >
            # (ref:05:115) never ties in practice (39k-image val set);
            # here the small val set saturates at 1.0 mid-run, and the
            # first-saturation snapshot is a half-formed judge whose
            # distortion robustness varies wildly run-to-run.
            best_acc = val_acc
            if save_path:
                best_state = snapshot(state)
                log(f"  new best (val acc {best_acc:.4f})")
    if save_path and best_state is not None:
        _save_ckpt(save_path, best_state, ckpt_config)
        log(f"saved best checkpoint (val acc {best_acc:.4f})")
    return state, best_acc


def _val_wrap_pad(va_idx: np.ndarray, bs: int):
    """Wrap-pad validation indices to a batch multiple.

    Returns ([vsteps, bs] int32 indices, [vsteps, bs] float32 mask); padded
    slots repeat the head of the val set and carry mask 0, so masked sums
    are exact."""
    va_idx = np.asarray(va_idx, np.int32)
    n = len(va_idx)
    if n == 0:
        raise ValueError(
            "empty validation set — the train split left no val samples; "
            "lower train_split or grow the dataset")
    vsteps = max(1, (n + bs - 1) // bs)
    total = vsteps * bs
    # modular wrap: correct even when the pad exceeds the val set itself
    # (tiny trees, e.g. 1 val sample at batch 4)
    idx = va_idx[np.arange(total) % n]
    mask = (np.arange(total) < n).astype(np.float32)
    return idx.reshape(vsteps, bs), mask.reshape(vsteps, bs)


def _per_sample_restoration_loss(pred, clean01, pixel, perceptual_weight,
                                 vgg_apply):
    """[B] per-sample restoration loss matching losses.restoration_loss."""
    import jax.numpy as jnp

    if pixel == "mse":
        pix = jnp.mean((pred - clean01) ** 2, axis=(1, 2, 3))
    else:
        pix = jnp.mean(jnp.abs(pred - clean01), axis=(1, 2, 3))
    if vgg_apply is not None:
        d = vgg_apply(pred) - vgg_apply(clean01)
        pix = pix + perceptual_weight * jnp.mean(d ** 2, axis=(1, 2, 3))
    return pix


def train_restorer_on_device(
    state: common.TrainState,
    bad_u8: np.ndarray,
    clean_u8: np.ndarray,
    tr_idx: np.ndarray,
    va_idx: np.ndarray,
    epochs: int,
    batch_size: int,
    pixel: str = "mse",
    perceptual_weight: float = 0.1,
    vgg_apply=None,
    save_path: Optional[str] = None,
    checkpoint_every: int = 0,
    save_best: bool = False,
    log: Callable[[str], None] = print,
    ckpt_config: Optional[dict] = None,
    seed: int = 0,
):
    """Specialized/advanced restorer training with HBM-resident pairs.

    Same recipe as :func:`train_restorer` (ref:07:122-181 MSE/Adam,
    ref:07adv:115-182 L1+perceptual) but each epoch is one jitted
    ``lax.scan`` — see :func:`train_judge_on_device` for why this is the
    TPU-shaped loop. ``checkpoint_every`` writes through to disk
    (ref:07:177-178); ``save_best`` snapshots on-device and writes once at
    the end (ref:14:265-267 semantics)."""
    import jax.numpy as jnp

    bs = batch_size
    bad_d = jax.device_put(np.ascontiguousarray(bad_u8))
    clean_d = jax.device_put(np.ascontiguousarray(clean_u8))
    tr_idx = np.asarray(tr_idx, np.int32)
    steps = len(tr_idx) // bs
    if steps == 0:
        raise ValueError(f"fewer than one batch: {len(tr_idx)} < {bs}")
    va_pad, va_mask = _val_wrap_pad(va_idx, bs)
    n_val = len(va_idx)
    va_pad_d = jax.device_put(va_pad)
    va_mask_d = jax.device_put(va_mask)

    step_fn = common.make_restoration_train_step(
        pixel, perceptual_weight, vgg_apply, jit=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(st, bad, clean, idx, rng):
        perm = jax.random.permutation(rng, idx)[:steps * bs]
        perm = perm.reshape(steps, bs)

        def body(st, bidx):
            xb = jnp.take(bad, bidx, axis=0)
            yb = jnp.take(clean, bidx, axis=0)
            st, aux = step_fn(st, xb, yb)
            return st, aux["loss"]

        st, ls = jax.lax.scan(body, st, perm)
        return st, jnp.mean(ls)

    @jax.jit
    def val_fn(st, bad, clean, idxs, masks):
        def body(tot, args):
            bidx, mask = args
            xb = image_ops.to_float01(jnp.take(bad, bidx, axis=0))
            yb = image_ops.to_float01(jnp.take(clean, bidx, axis=0))
            if st.batch_stats is not None:
                pred = st.apply_fn(st.variables, xb, train=False)
            else:
                pred = st.apply_fn(st.variables, xb)
            ls = _per_sample_restoration_loss(
                pred, yb, pixel, perceptual_weight, vgg_apply)
            return tot + jnp.sum(ls * mask), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), (idxs, masks))
        return tot

    snapshot = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    rng = jax.random.PRNGKey(seed)
    idx_d = jax.device_put(tr_idx)
    best_loss, best_state = float("inf"), None
    for epoch in range(epochs):
        t0 = time.perf_counter()
        rng, er = jax.random.split(rng)
        state, mloss = epoch_fn(state, bad_d, clean_d, idx_d, er)
        vl = float(val_fn(state, bad_d, clean_d,
                          va_pad_d, va_mask_d)) / max(n_val, 1)
        dt = time.perf_counter() - t0
        log(f"Epoch {epoch + 1}/{epochs} train loss {float(mloss):.6f} "
            f"({steps * bs / max(dt, 1e-9):.1f} img/s)")
        log(f"  val loss {vl:.6f}")
        if save_path:
            if checkpoint_every and (epoch + 1) % checkpoint_every == 0:
                _save_ckpt(save_path, state, ckpt_config)
            if save_best and vl < best_loss:
                best_loss = vl
                best_state = snapshot(state)
                log("  new best (val loss)")
    if save_path:
        if save_best and best_state is not None:
            _save_ckpt(save_path, best_state, ckpt_config)
            log(f"saved best checkpoint (val loss {best_loss:.6f})")
        elif not save_best:
            _save_ckpt(save_path, state, ckpt_config)
    return state


def train_unified_on_device(
    state: common.TrainState,
    clean_u8: np.ndarray,
    tr_idx: np.ndarray,
    va_idx: np.ndarray,
    cfg: configs.UnifiedTrainConfig,
    vgg_apply=None,
    save_path: Optional[str] = None,
    log: Callable[[str], None] = print,
    ckpt_config: Optional[dict] = None,
    remat=None,
):
    """Unified ResUNet training (ref:14:227-267) with the clean tree in HBM
    and scanned epochs; the random-mix distortion already runs on-device
    inside the step, so this removes the last host round-trips.

    ``remat`` (None = auto): rematerialization placement passed through to
    :func:`common.make_unified_train_step`. Auto selects ``"vgg"`` for
    batches >64 with a perceptual term (the frozen-VGG activations are
    what overflows 16 GB HBM there) and no remat otherwise."""
    import jax.numpy as jnp

    from tsr_tpu.ops import distortions

    bs = cfg.batch_size
    if remat is None:
        remat = "vgg" if (vgg_apply is not None and bs > 64) else False
    clean_d = jax.device_put(np.ascontiguousarray(clean_u8))
    tr_idx = np.asarray(tr_idx, np.int32)
    steps = len(tr_idx) // bs
    if steps == 0:
        raise ValueError(f"fewer than one batch: {len(tr_idx)} < {bs}")
    va_pad, va_mask = _val_wrap_pad(va_idx, bs)
    n_val = len(va_idx)
    va_pad_d = jax.device_put(va_pad)
    va_mask_d = jax.device_put(va_mask)

    step_fn = common.make_unified_train_step(
        cfg.mix, cfg.perceptual_weight, vgg_apply, remat=remat, jit=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(st, clean, idx, rng):
        perm = jax.random.permutation(rng, idx)[:steps * bs]
        perm = perm.reshape(steps, bs)

        def body(carry, bidx):
            st, rng = carry
            rng, k = jax.random.split(rng)
            cb = jnp.take(clean, bidx, axis=0)
            st, aux = step_fn(st, cb, k)
            return (st, rng), aux["loss"]

        (st, _), ls = jax.lax.scan(body, (st, rng), perm)
        return st, jnp.mean(ls)

    @jax.jit
    def val_fn(st, clean, idxs, masks, rng):
        def body(carry, args):
            tot, rng = carry
            bidx, mask = args
            rng, k = jax.random.split(rng)
            cb = jnp.take(clean, bidx, axis=0)
            bad01, clean01 = distortions.make_training_pair(cb, k, cfg.mix)
            pred = st.apply_fn(st.variables, bad01, train=False)
            ls = _per_sample_restoration_loss(
                pred, clean01, "l1", cfg.perceptual_weight, vgg_apply)
            return (tot + jnp.sum(ls * mask), rng), None

        (tot, _), _ = jax.lax.scan(
            body, (jnp.float32(0.0), rng), (idxs, masks))
        return tot

    snapshot = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    rng = jax.random.PRNGKey(cfg.seed)
    idx_d = jax.device_put(tr_idx)
    best_loss, best_state = float("inf"), None
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        rng, er, vr = jax.random.split(rng, 3)
        state, mloss = epoch_fn(state, clean_d, idx_d, er)
        vl = float(val_fn(state, clean_d, va_pad_d, va_mask_d,
                          vr)) / max(n_val, 1)
        dt = time.perf_counter() - t0
        log(f"Epoch {epoch + 1}/{cfg.epochs} train loss {float(mloss):.5f} "
            f"({steps * bs / max(dt, 1e-9):.1f} img/s)")
        log(f"  val loss {vl:.5f}")
        if save_path and vl < best_loss:
            best_loss = vl
            best_state = snapshot(state)
            log("  new best (val loss)")
    if save_path and best_state is not None:
        _save_ckpt(save_path, best_state, ckpt_config)
        log(f"saved best checkpoint (val loss {best_loss:.5f})")
    return state


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
    best_loss, best_state = float("inf"), None
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
                if checkpoint_every:
                    # deep-copy: the train step donates its state input,
                    # so a bare reference would alias buffers a later
                    # step deletes
                    import jax.numpy as jnp

                    best_state = jax.tree.map(jnp.copy, state)
                _save_ckpt(save_path, state, ckpt_config)
                log("  saved best (val loss)")
    if save_path:
        if not save_best:
            _save_ckpt(save_path, state, ckpt_config)
        elif best_state is not None and checkpoint_every:
            # a periodic checkpoint after the best epoch overwrote the
            # best weights at the shared save_path — re-write the best
            # last, matching train_restorer_on_device's semantics
            _save_ckpt(save_path, best_state, ckpt_config)
            log(f"saved best checkpoint (val loss {best_loss:.6f})")
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
