"""Evaluation: fused restore→classify graphs and the accuracy harness.

The reference evaluates in three disk-coupled stages: restore to PNG files
(ref:08:92-109, batch size 1!), re-read them with ImageFolder, then classify
(ref:06:23-59 / 09 / 18). Here the whole chain —

    uint8 batch -> [0,1] -> restorer -> clamp -> (uint8 quantize) ->
    ImageNet-normalize -> VGG16 judge -> top-1

— is one jitted graph per batch with no host round-trip; that is the
BASELINE.json north-star path. ``quantize=True`` keeps the reference's
save-to-PNG uint8 quantization (ref:08:96-98) inside the graph for exact
parity; ``quantize=False`` skips it for a cleaner (and slightly more
accurate) pipeline.

PSNR/SSIM metrics (ref:08:111-135) are computed on-device as well.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tsr_tpu import configs
from tsr_tpu.ops import image as image_ops


def restore_batch(restorer_apply: Callable, restorer_vars, bad01,
                  quantize: bool = True):
    """Restore a float01 batch; clamp to [0,1] (ref:08:96, 17:86) and
    optionally apply the PNG-save uint8 quantization (trunc, ref:08:98)."""
    out = restorer_apply(restorer_vars, bad01)
    out = jnp.clip(out, 0.0, 1.0)
    if quantize:
        out = jnp.trunc(image_ops.scale255(out)) / 255.0
    return out


def make_fused_eval_step(
    restorer_apply: Optional[Callable],
    judge_apply: Callable,
    quantize: bool = True,
    with_metrics: bool = False,
    native_size: Optional[int] = None,
):
    """Build the fused (restore→)classify step.

    Returns ``step(restorer_vars, judge_vars, images_u8, labels, clean_u8)``
    → dict with ``correct`` (scalar), ``pred`` [B], and optionally ``psnr`` /
    ``ssim`` [B] vs ``clean_u8``. Pass ``restorer_apply=None`` for
    classify-only evaluation (ref:06).

    With ``native_size=S`` (the device-resize serving path), ``images_u8``
    is a tuple ``(padded_u8 [B,Hp,Wp,3], sizes_hw [B,2])`` of
    native-resolution pixels and the resize to ``S`` runs on device
    (ops.image.resize_from_padded) — only native bytes cross the
    host→device link.
    """

    @jax.jit
    def step(restorer_vars, judge_vars, images_u8, labels,
             clean_u8=None):
        if native_size is not None:
            padded, sizes = images_u8
            images_u8 = image_ops.resize_from_padded(padded, sizes,
                                                     native_size)
        x01 = image_ops.to_float01(images_u8)
        out = {}
        if restorer_apply is not None:
            x01 = restore_batch(restorer_apply, restorer_vars, x01,
                                quantize=quantize)
        logits = judge_apply(
            judge_vars, image_ops.imagenet_normalize(x01), train=False)
        pred = jnp.argmax(logits, -1)
        out["pred"] = pred
        out["correct"] = jnp.sum(pred == labels)
        out["confidence"] = jnp.max(jax.nn.softmax(logits, -1), -1)
        if with_metrics and clean_u8 is not None:
            restored_u8 = jnp.trunc(image_ops.scale255(x01))
            out["psnr"] = image_ops.psnr(
                restored_u8, jnp.asarray(clean_u8, jnp.float32))
            out["ssim"] = image_ops.ssim(
                restored_u8.astype(jnp.uint8), clean_u8)
        return out

    return step


def evaluate_batches(
    step,
    restorer_vars,
    judge_vars,
    batch_iter: Iterable,
    with_metrics: bool = False,
) -> Dict[str, float]:
    """Drive a fused eval step over numpy batches.

    ``batch_iter`` yields (images_u8, labels) or (images_u8, labels,
    clean_u8). Returns aggregate top-1 (and mean PSNR/SSIM/confidence).
    """
    import time

    t0 = time.perf_counter()
    correct = total = timed = 0
    t_warm = None  # set after batch 0: excludes JIT compile from the timer
    psnrs, ssims, confs = [], [], []
    for batch in batch_iter:
        images, labels = batch[0], batch[1]
        clean = batch[2] if len(batch) > 2 else None
        out = step(restorer_vars, judge_vars, images, labels, clean)
        correct += int(out["correct"])  # device->host read: a sync point
        total += len(labels)
        confs.append(np.asarray(out["confidence"]))
        if with_metrics and "psnr" in out:
            psnrs.append(np.asarray(out["psnr"]))
            ssims.append(np.asarray(out["ssim"]))
        # start the steady-state window only after batch 0's device->host
        # transfers too — not just its compute — or their cost lands in a
        # window whose image count excludes batch 0
        if t_warm is None:
            t_warm = time.perf_counter()
        else:
            timed += len(labels)
    # steady-state throughput: batch 0 (compile + relay first-touch) is the
    # warmup and is excluded; a single-batch run keeps the cold number
    if timed:
        ips = timed / max(time.perf_counter() - t_warm, 1e-9)
    else:
        ips = total / max(time.perf_counter() - t0, 1e-9)
    res = {"top1": correct / max(total, 1), "n": total,
           "images_per_sec": round(ips, 1),
           "confidence": float(np.mean(np.concatenate(confs)))
           if confs else float("nan")}
    if psnrs:
        res["psnr"] = float(np.mean(np.concatenate(psnrs)))
        res["ssim"] = float(np.mean(np.concatenate(ssims)))
    return res


def evaluate_directory(
    judge_apply: Callable,
    judge_vars,
    data_dir: str,
    batch_size: int = 64,
    size: int = configs.IMAGE_SIZE,
    restorer_apply: Optional[Callable] = None,
    restorer_vars=None,
    quantize: bool = True,
    mesh=None,
    resize: str = "host",
) -> Dict[str, float]:
    """Directory top-1 evaluation (ref:06:23-59): ImageFolder over
    ``data_dir``, optional fused restoration before the judge.

    ``mesh`` runs the harness data-parallel: model variables are
    replicated on the mesh and each batch is sharded over its data axis
    (the uneven tail batch is replicated — exact either way).

    Batches are placed on device inside the prefetch producer thread, so
    the host->device upload of batch k+1 overlaps the judge forward of
    batch k (the upload link, not the chip, bounds this harness). On a
    remote-TPU relay that link IS the harness floor (~40 MB/s up →
    ~220 img/s at 224²); ``resize="device"`` lifts it by uploading
    native-resolution pixels and resizing on device
    (ops.image.resize_from_padded, ≤1 LSB vs cv2 — PARITY.md). The default
    stays "host": the accuracy-parity claims are made against the
    reference's host-resize semantics. Device resize requires the cv2
    backend and no mesh."""
    from tsr_tpu.data import gtsrb

    ds = gtsrb.ImageFolder(data_dir, size=size)
    if (resize == "device" and mesh is None
            and gtsrb.RESIZE_BACKEND == "cv2"):
        return _evaluate_directory_native(
            ds, judge_apply, judge_vars, batch_size, size,
            restorer_apply, restorer_vars, quantize)
    step = make_fused_eval_step(restorer_apply, judge_apply,
                                quantize=quantize)
    if mesh is not None:
        from tsr_tpu.parallel import mesh as pmesh

        judge_vars = pmesh.shard_variables(judge_vars, mesh)
        if restorer_vars is not None:
            restorer_vars = pmesh.shard_variables(restorer_vars, mesh)
        placer = lambda b: tuple(  # noqa: E731
            pmesh.shard_batch_or_replicate(b, mesh))
    else:
        placer = lambda b: tuple(jax.device_put(list(b)))  # noqa: E731
    it = gtsrb.batches(ds, batch_size=batch_size, shuffle=False,
                       drop_remainder=False, epochs=1, transform=placer)
    return evaluate_batches(step, restorer_vars, judge_vars, it)


def _evaluate_directory_native(ds, judge_apply, judge_vars, batch_size,
                               size, restorer_apply, restorer_vars,
                               quantize):
    """Device-resize variant of the directory harness: the bucketing
    producer (infer.native_batches) uploads native-resolution pixels and
    the fused step resizes on device. pad_batch=False: labels must count
    real rows only, so bucket-tail batches take one extra (cached)
    compile each instead of masking."""
    from tsr_tpu import infer

    labels_all = np.asarray([lab for _, lab in ds.samples], np.int32)
    paths = [p for p, _ in ds.samples]
    step = make_fused_eval_step(restorer_apply, judge_apply,
                                quantize=quantize, native_size=size)

    def gen():
        it = infer.native_batches(paths, size, batch_size,
                                  pad_batch=False)
        for padded, sizes, _, idxs in it:
            yield ((padded, sizes),
                   jax.device_put(labels_all[np.asarray(idxs)]))

    return evaluate_batches(step, restorer_vars, judge_vars, gen())
