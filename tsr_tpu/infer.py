"""Batched restoration inference over file trees.

Replaces ref:08 (per-image, batch-1 loop) and ref:17 (batch-32 loop): files
are decoded/resized on host threads, restored on device in large batches,
and written back as PNG preserving the class-folder structure
(ref:08:102-109, 17:89-99). PSNR/SSIM against the resized clean tree are
computed on device inside the same jitted step (ref:08:111-129).

The whole tree walk is a three-stage pipeline with no serialized host work:

  producer thread   decode+resize (bad, clean) batches; upload ONLY the
                    distorted batch to device
  main thread       dispatch the jitted restore step (async), hand the
                    pending device buffer to the worker pool
  worker pool       fetch restored pixels (device->host), PNG-encode +
                    write (native threaded encoder via
                    tsr_tpu.native.write_png_batch, cv2 fallback), and
                    score PSNR/SSIM vs the host-resident clean batch
                    (ops.image_host — same formulas as the on-device
                    ops.image versions, ref:08:111-129)

so decode, upload, device compute, download, and encode+write+score all
overlap. The reference serializes every one of these per image
(ref:08:86-109).

Why metrics run on host: the measured batch sweep
(benchmarks/readings/r5/restore_ab_v0.jsonl) shows this path is
relay-*bandwidth*-bound (img/s FALLS as batch grows: 82 -> 47 from batch
64 to 256; benchmarks/relay_diag.py measured the link at ~40 MB/s up /
~23 MB/s down, half-duplex), so shipping the clean tree to the device
purely to score two cheap statistics was a third of all link traffic.
Keeping clean on host cuts bytes moved per image from 3 units to 2 (bad
up, restored down); a semaphore bounds in-flight device output buffers so
HBM use stays capped while downloads proceed concurrently in the pool.

``resize="device"`` (the measured default for the cv2 backend) goes
further: the producer uploads images at NATIVE resolution (GTSRB sources
are mostly 30-60 px — ~5-25x fewer bytes than 224^2) bucket-padded, and
the jitted step resizes on device via ops.image.resize_from_padded —
per-image bilinear as two dense MXU matmuls with traced native sizes.
Images at or above the target size are host-resized and pass through the
device resize as an exact identity. Output parity vs the host-cv2 path is
within 1 LSB of cv2's fixed-point resize (PARITY.md "Resize parity").
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


def make_native_restore_step(restorer_apply: Callable,
                             has_batch_stats: bool, out_size: int):
    """Native-upload variant of :func:`make_restore_step`: takes a
    bucket-padded native-resolution uint8 batch + per-image (h, w) sizes,
    resizes on device (ops.image.resize_from_padded), restores, and
    returns the restored uint8 batch."""

    @jax.jit
    def step(variables, padded_u8, sizes_hw):
        x224 = image_ops.resize_from_padded(padded_u8, sizes_hw, out_size)
        x01 = image_ops.to_float01(x224)
        if has_batch_stats:
            out = restorer_apply(variables, x01, train=False)
        else:
            out = restorer_apply(variables, x01)
        out = jnp.clip(out, 0.0, 1.0)
        return jnp.trunc(image_ops.scale255(out)).astype(jnp.uint8)

    return step


# Native-upload bucket sides. Coarse on purpose: each (bucket, batch)
# shape is a separate XLA compile (~20-40 s through the relay, cached
# across runs), and bucket-padding overhead only costs upload bytes.
_NATIVE_BUCKETS = (64, 128, 192)


def native_batches(paths: List[str], out_size: int, batch_size: int,
                   aux_fn: Optional[Callable] = None,
                   pad_batch: bool = True,
                   decode_workers: int = 8,
                   prefetch: int = 3):
    """Producer generator for the device-resize paths (restore_tree and
    evaluate_directory).

    Decodes each image at NATIVE resolution, groups by padded bucket, and
    yields ``(padded_dev, sizes_dev, aux_list, item_indices)``. ``aux_fn(i)``
    (run inside the decode pool) supplies a per-item host payload — the
    resized clean twin for restore metrics, the label for eval — returned
    as a list aligned with ``item_indices``. With ``pad_batch`` the batch
    dim is zero-padded to ``batch_size`` (one compile per bucket, not per
    remainder; filler rows resize a 1x1 black pixel). Images with max dim
    >= out_size are host-resized and ride the out_size bucket, where the
    device resize is an exact identity. Runs in a background thread;
    decode uses a cv2 thread pool (cv2 releases the GIL)."""
    import queue
    import threading

    from tsr_tpu.data import gtsrb

    def decode(i):
        import cv2

        img = cv2.imread(paths[i])
        if img is None:
            from PIL import Image

            img = np.asarray(Image.open(paths[i]).convert("RGB")
                             )[:, :, ::-1]
        img = np.ascontiguousarray(img[:, :, ::-1])
        if max(img.shape[:2]) >= out_size:
            img = gtsrb._decode_resize(paths[i], out_size)
        return i, img, (aux_fn(i) if aux_fn is not None else None)

    def bucket_of(img):
        m = max(img.shape[:2])
        for b in _NATIVE_BUCKETS:
            if m <= b and b < out_size:
                return b
        return out_size

    def emit(bucket, entries):
        k = len(entries)
        rows = batch_size if pad_batch else k
        padded = np.zeros((rows, bucket, bucket, 3), np.uint8)
        sizes = np.ones((rows, 2), np.int32)
        aux, idxs = [], []
        for j, (i, img, a) in enumerate(entries):
            h, w = img.shape[:2]
            padded[j, :h, :w] = img
            sizes[j] = (h, w)
            aux.append(a)
            idxs.append(i)
        return (jax.device_put(padded), jax.device_put(sizes), aux, idxs)

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put(x) -> bool:
        """Bounded put that honors early consumer exit."""
        while not stop.is_set():
            try:
                q.put(x, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def bounded_map(ex, n, window):
        """Like ex.map but with a bounded in-flight window (plain map
        submits the ENTIRE iterable eagerly — the whole tree decoded
        ahead of the consumer)."""
        import collections

        futs: collections.deque = collections.deque()
        i = 0
        while futs or i < n:
            while i < n and len(futs) < window and not stop.is_set():
                futs.append(ex.submit(decode, i))
                i += 1
            if not futs:
                return
            yield futs.popleft().result()

    def produce():
        try:
            groups: Dict[int, list] = {}
            with cf.ThreadPoolExecutor(decode_workers) as ex:
                for item in bounded_map(ex, len(paths),
                                        decode_workers * 4):
                    if stop.is_set():
                        return
                    b = bucket_of(item[1])
                    groups.setdefault(b, []).append(item)
                    if len(groups[b]) == batch_size:
                        if not put(emit(b, groups.pop(b))):
                            return
            for b in sorted(groups):
                if not put(emit(b, groups[b])):
                    return
            put(None)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            put(e)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            got = q.get()
            if got is None:
                return
            if isinstance(got, BaseException):
                raise got
            yield got
    finally:
        stop.set()


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
    workers: int = 3,
    max_inflight: int = 4,
    resize: str = "device",
    log: Callable[[str], None] = print,
) -> Dict[str, float]:
    """Restore every image under ``distorted_dir`` into ``restored_dir``
    (as ``.png``, class tree preserved); optionally compute mean PSNR/SSIM
    vs ``clean_dir`` (ref:08:111-135). Fully pipelined — see module
    docstring. ``workers`` sizes the fetch+write+score pool;
    ``max_inflight`` bounds undownloaded device output buffers (HBM cap =
    max_inflight * batch * size^2 * 3 bytes). ``resize``:

    - ``"device"`` (default, measured fastest over the relay): upload
      native-resolution pixels, bilinear-resize on device
      (ops.image.resize_from_padded; within 1 LSB of cv2).
    - ``"host"``: cv2/PIL resize on host, upload at ``size`` — the exact
      reference input semantics (and the only mode honoring the "pil"
      resize backend, which this function auto-selects)."""
    import threading

    from tsr_tpu.data import gtsrb
    from tsr_tpu.ops import image_host

    if gtsrb.RESIZE_BACKEND != "cv2":
        resize = "host"  # PIL bit-parity mode must resize on host

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
    ds = _RestorePairs(files, distorted,
                       Path(clean_dir) if with_metrics else None, size)

    if resize == "device":
        native_step = make_native_restore_step(restorer_apply,
                                               has_batch_stats, size)

        def aux_fn(i):
            cpath = ds.items[i][1]
            if with_metrics and cpath:
                from tsr_tpu.data import gtsrb as g

                return g._decode_resize(cpath, size)
            return None

        it = native_batches([d for d, _ in ds.items], size, batch_size,
                            aux_fn=aux_fn if with_metrics else None)

        def dispatch(variables, batch):
            padded, sizes, aux, idxs = batch
            k = len(idxs)
            mask = np.asarray([a is not None for a in aux]
                              if aux else [False] * k)
            if mask.any():
                clean = np.stack([
                    a if a is not None
                    else np.zeros((size, size, 3), np.uint8) for a in aux])
            else:
                clean = None
            return native_step(variables, padded, sizes), clean, mask, idxs
    else:
        host_step = make_restore_step(restorer_apply, has_batch_stats)

        def to_device(item):
            bad, clean, mask = item
            # clean never leaves the host — it is only needed for
            # metrics, which image_host computes on the worker pool
            return jax.device_put(bad), clean, mask

        base = gtsrb.batches(ds, batch_size=batch_size, shuffle=False,
                             drop_remainder=False, epochs=1,
                             transform=to_device)

        def with_indices(gen):
            k = 0
            for bad, clean, mask in gen:
                b = bad.shape[0]
                yield bad, clean, mask, list(range(k, k + b))
                k += b

        it = with_indices(base)

        def dispatch(variables, batch):
            bad, clean, mask, idxs = batch
            return host_step(variables, bad), clean, mask, idxs

    import time

    sem = threading.Semaphore(max_inflight)

    def finish(out_dev, paths, clean_host, mask):
        """Worker-pool task: download one restored batch, write PNGs,
        score vs the host-resident clean batch."""
        try:
            out_host = np.asarray(out_dev)[:len(paths)]  # device->host
            _write_png_batch(paths, out_host)
            if clean_host is not None and mask.any():
                return (image_host.psnr(out_host[mask], clean_host[mask]),
                        image_host.ssim(out_host[mask], clean_host[mask]))
            return None
        finally:
            sem.release()

    n = 0
    futures = []
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(workers) as pool:
        for batch in it:
            sem.acquire()  # cap pending device output buffers
            out, clean, mask, idxs = dispatch(variables, batch)  # async
            futures.append(pool.submit(
                finish, out, [out_paths[i] for i in idxs],
                clean if with_metrics else None, mask))
            n += len(idxs)
        scored = [f.result() for f in futures]  # re-raises worker errors

    dt = time.perf_counter() - t0
    res: Dict[str, float] = {"images": n,
                             "images_per_sec": round(n / max(dt, 1e-9), 1)}
    log(f"Restored {n} images in {dt:.1f}s "
        f"({res['images_per_sec']} img/s, decode+restore+encode pipelined)")
    scored = [m for m in scored if m is not None]
    if scored:
        res["psnr"] = float(np.mean(np.concatenate([p for p, _ in scored])))
        res["ssim"] = float(np.mean(np.concatenate([s for _, s in scored])))
        log(f"Average PSNR: {res['psnr']:.2f} dB")
        log(f"Average SSIM: {res['ssim']:.4f}")
    return res
