"""Batched restoration inference over file trees.

Replaces ref:08 (per-image, batch-1 loop) and ref:17 (batch-32 loop): files
are decoded/resized on host threads, restored on device in large batches,
and written back as PNG preserving the class-folder structure
(ref:08:102-109, 17:89-99). PSNR/SSIM against the resized clean tree are
computed on device inside the same jitted step (ref:08:111-129).

The whole tree walk is a three-stage pipeline with no serialized host work:

  producer thread   decode+resize (bad, clean) batches, upload to device
  main thread       dispatch the jitted restore(+metrics) step; while batch
                    k+1 computes, fetch batch k's restored pixels
  writer thread     PNG-encode + write (native threaded encoder via
                    tsr_tpu.native.write_png_batch, cv2 fallback)

so decode, upload, device compute, download, and encode+write all overlap.
The reference serializes every one of these per image (ref:08:86-109).
"""

from __future__ import annotations

import concurrent.futures as cf
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tsr_tpu import configs
from tsr_tpu.ops import image as image_ops


def _write_png(path: Path, rgb_u8: np.ndarray):
    import cv2

    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), rgb_u8[:, :, ::-1])  # RGB -> BGR (ref:08:100)


def _write_png_batch(paths: List[str], images: np.ndarray):
    """Batch PNG write: native threaded encoder, cv2 fallback. Parent dirs
    must already exist."""
    try:
        from tsr_tpu import native

        if native.available():
            native.write_png_batch(paths, images)
            return
    except Exception:
        pass
    import cv2

    for p, img in zip(paths, images):
        cv2.imwrite(p, img[:, :, ::-1])


def make_restore_step(restorer_apply: Callable, has_batch_stats: bool,
                      with_metrics: bool = False):
    """uint8 batch -> restored uint8 batch (clamp + PNG quantization,
    ref:08:96-98); with ``with_metrics`` also returns per-image PSNR/SSIM
    vs a clean uint8 batch, fused into the same jitted graph."""

    @jax.jit
    def step(variables, images_u8):
        x01 = image_ops.to_float01(images_u8)
        if has_batch_stats:
            out = restorer_apply(variables, x01, train=False)
        else:
            out = restorer_apply(variables, x01)
        out = jnp.clip(out, 0.0, 1.0)
        return jnp.trunc(image_ops.scale255(out)).astype(jnp.uint8)

    if not with_metrics:
        return step

    @jax.jit
    def step_metrics(variables, images_u8, clean_u8):
        restored = step(variables, images_u8)
        rf = restored.astype(jnp.float32)
        cf_ = jnp.asarray(clean_u8, jnp.float32)
        return (restored, image_ops.psnr(rf, cf_),
                image_ops.ssim(restored, clean_u8))

    return step_metrics


class _RestorePairs:
    """Dataset over (distorted file, optional clean twin): yields
    (bad_u8, clean_u8, has_clean) batches. Missing cleans get a zero image
    and a False mask (their metrics are dropped on host)."""

    def __init__(self, files: List[Path], distorted_root: Path,
                 clean_root: Optional[Path], size: int):
        from tsr_tpu.data import gtsrb

        self._gtsrb = gtsrb
        self.size = size
        self.items: List[Tuple[str, Optional[str]]] = []
        for p in files:
            cp = None
            if clean_root is not None:
                cand = clean_root / p.relative_to(distorted_root)
                for c in (cand, cand.with_suffix(".ppm"),
                          cand.with_suffix(".png")):
                    if c.exists():
                        cp = str(c)
                        break
            self.items.append((str(p), cp))

    def __len__(self):
        return len(self.items)

    def load_batch(self, indices):
        g = self._gtsrb
        bad = g._decode_resize_batch(
            [self.items[i][0] for i in indices], self.size)
        clean_paths = [self.items[i][1] for i in indices]
        mask = np.asarray([c is not None for c in clean_paths])
        if mask.any():
            clean = g._decode_resize_batch(
                [c or self.items[i][0]
                 for i, c in zip(indices, clean_paths)], self.size)
            clean[~mask] = 0
        else:
            clean = np.zeros_like(bad)
        return bad, clean, mask


def restore_tree(
    restorer_apply: Callable,
    variables,
    distorted_dir: str,
    restored_dir: str,
    clean_dir: Optional[str] = None,
    batch_size: int = 64,
    size: int = configs.IMAGE_SIZE,
    has_batch_stats: bool = False,
    compute_metrics: bool = True,
    log: Callable[[str], None] = print,
) -> Dict[str, float]:
    """Restore every image under ``distorted_dir`` into ``restored_dir``
    (as ``.png``, class tree preserved); optionally compute mean PSNR/SSIM
    vs ``clean_dir`` (ref:08:111-135). Fully pipelined — see module
    docstring."""
    from tsr_tpu.data import gtsrb

    distorted = Path(distorted_dir)
    restored = Path(restored_dir)
    files = sorted(
        p for p in distorted.glob("*/*")
        if p.suffix.lower() in gtsrb.IMG_EXTENSIONS
    )
    out_paths = [str((restored / p.relative_to(distorted)
                      ).with_suffix(".png")) for p in files]
    for d in {Path(p).parent for p in out_paths}:
        d.mkdir(parents=True, exist_ok=True)

    with_metrics = compute_metrics and clean_dir is not None
    step = make_restore_step(restorer_apply, has_batch_stats,
                             with_metrics=with_metrics)
    ds = _RestorePairs(files, distorted,
                       Path(clean_dir) if clean_dir else None, size)

    def to_device(item):
        bad, clean, mask = item
        return jax.device_put(bad), jax.device_put(clean), mask

    it = gtsrb.batches(ds, batch_size=batch_size, shuffle=False,
                       drop_remainder=False, epochs=1,
                       transform=to_device)

    import time

    psnrs, ssims = [], []
    n = 0
    t0 = time.perf_counter()
    pending = None  # (out_device, path_slice): fetch AFTER dispatching next

    def drain(writer):
        out_dev, paths = pending
        out_host = np.asarray(out_dev)  # device->host of batch k while
        writer.submit(_write_png_batch, paths, out_host)  # k+1 computes

    with cf.ThreadPoolExecutor(1) as writer:
        for bad, clean, mask in it:
            b = bad.shape[0]
            if with_metrics:
                out, p, s = step(variables, bad, clean)
                if mask.any():
                    psnrs.append((p, mask))
                    ssims.append((s, mask))
            else:
                out = step(variables, bad)
            if pending is not None:
                drain(writer)
            pending = (out, out_paths[n:n + b])
            n += b
        if pending is not None:
            drain(writer)

    dt = time.perf_counter() - t0
    res: Dict[str, float] = {"images": n,
                             "images_per_sec": round(n / max(dt, 1e-9), 1)}
    log(f"Restored {n} images in {dt:.1f}s "
        f"({res['images_per_sec']} img/s, decode+restore+encode pipelined)")
    if psnrs:
        pv = np.concatenate([np.asarray(p)[m] for p, m in psnrs])
        sv = np.concatenate([np.asarray(s)[m] for s, m in ssims])
        res["psnr"] = float(np.mean(pv))
        res["ssim"] = float(np.mean(sv))
        log(f"Average PSNR: {res['psnr']:.2f} dB")
        log(f"Average SSIM: {res['ssim']:.4f}")
    return res
