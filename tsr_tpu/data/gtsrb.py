"""GTSRB data pipeline.

Host-side equivalents of the reference's data layer:

- :func:`download_gtsrb` — ref:01:5-18 (gated; zero-egress environments get
  a clear message and can point ``root`` at an existing copy).
- :class:`ImageFolder` — torchvision ``ImageFolder`` semantics used by the
  judge/eval paths (ref:05:32, 06:39): classes are the sorted subdirectory
  names; samples sorted per class.
- :class:`PairedFolder` — the restorer's (distorted, clean) pairing by
  relative path with ``.png`` fallback (ref:07:35-72).
- :func:`batches` — a shuffling, epoch-based batch iterator with a
  background-thread prefetcher standing in for DataLoader workers
  (ref:05:39, 07:137). Decode+resize happen here on host; all distortion
  math runs on device (tsr_tpu.ops.distortions).

Images are decoded with cv2 (BGR->RGB) and bilinear-resized to the target
size, returned as uint8 NHWC arrays.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tsr_tpu import configs

IMG_EXTENSIONS = (".ppm", ".png", ".jpg", ".jpeg", ".bmp")

DEFAULT_ROOT = "./data/gtsrb/GTSRB/Training"
GTSRB_URL = (
    "https://sid.erda.dk/public/archives/"
    "daaeac0d7ce1152aea9b61d9f1e19370/GTSRB-Training_fixed.zip"
)


def download_gtsrb(root: str = "./data") -> str:
    """Fetch and extract the GTSRB training split (ref:01:5-18).

    Returns the Training-tree path. In offline environments this raises with
    instructions rather than failing mysteriously.
    """
    target = Path(root) / "gtsrb" / "GTSRB" / "Training"
    if target.exists():
        return str(target)
    import io
    import urllib.request
    import zipfile

    try:
        with urllib.request.urlopen(GTSRB_URL, timeout=60) as r:
            data = r.read()
    except Exception as e:  # pragma: no cover - network-dependent
        raise RuntimeError(
            f"Could not download GTSRB ({e}). If you have a copy, place the "
            f"class folders under {target} (ref layout: "
            "<Training>/<class>/<img>.ppm)."
        ) from e
    with zipfile.ZipFile(io.BytesIO(data)) as zf:  # pragma: no cover
        zf.extractall(Path(root) / "gtsrb")
    return str(target)


# Host resize backend: "cv2" (INTER_LINEAR, default — matches the native
# C++ loader) or "pil" (PIL BILINEAR — bit-parity with the reference's
# torchvision transforms.Resize, ref:05:24-29, 07:124-126). Measured delta
# (PARITY.md "Resize parity"): identical within 1 LSB on upscales (GTSRB is
# mostly 30-60px -> 224), but PIL antialiases on DOWNSCALE where cv2
# INTER_LINEAR does not (250->224: max delta 33, 13% of pixels >1 LSB) —
# parity runs on trees containing >224px sources should set "pil".
RESIZE_BACKEND = "cv2"


def set_resize_backend(backend: str) -> None:
    if backend not in ("cv2", "pil"):
        raise ValueError(f"unknown resize backend {backend!r}")
    global RESIZE_BACKEND
    RESIZE_BACKEND = backend


def _decode_resize(path: str, size: int) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        # PIL fallback for formats cv2 rejects
        from PIL import Image

        pil = Image.open(path).convert("RGB")
        img = np.asarray(pil)[:, :, ::-1]
    if RESIZE_BACKEND == "pil":
        from PIL import Image

        rgb = np.ascontiguousarray(img[:, :, ::-1])
        return np.asarray(
            Image.fromarray(rgb).resize((size, size), Image.BILINEAR))
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB


_NATIVE_EXTS = (".ppm", ".bmp", ".png")


def _decode_resize_batch(paths: Sequence[str], size: int,
                         threads: int = 8) -> np.ndarray:
    """Batch decode+resize; uses the native C++ loader (tsr_tpu.native)
    for PPM/BMP/PNG trees — GTSRB plus every distorted/restored tree
    (.png, ref:16:55/ref:09:15-26) — and cv2 otherwise. The native loader
    clones cv2 bilinear, so the "pil" backend bypasses it. An exotic PNG
    the native decoder rejects (16-bit, interlaced) fails the whole batch
    over to cv2 via load_batch's count check. ``TSR_NATIVE_IO=0`` forces
    the cv2 path (same resize semantics) — the A/B lever for measuring the
    native decoder's end-to-end img/s contribution (benchmarks/io_bench.py
    measures decode alone)."""
    if (RESIZE_BACKEND == "cv2" and paths
            and os.environ.get("TSR_NATIVE_IO", "1") != "0"
            and all(p.lower().endswith(_NATIVE_EXTS) for p in paths)):
        try:
            from tsr_tpu import native

            if native.available():
                return native.load_batch(list(paths), size, threads=threads)
        except Exception:
            pass  # fall back to cv2
    return np.stack([_decode_resize(p, size) for p in paths])


class ImageFolder:
    """torchvision-ImageFolder-equivalent directory scanner.

    ``classes`` are the sorted subdirectory names (matching the reference's
    label indexing, ref:05:32); ``samples`` is a list of (path, label).
    """

    def __init__(self, root: str, size: int = configs.IMAGE_SIZE):
        self.root = Path(root)
        self.size = size
        if not self.root.exists():
            raise FileNotFoundError(f"{root} does not exist")
        self.classes = sorted(
            d.name for d in self.root.iterdir() if d.is_dir()
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in self.classes:
            for p in sorted((self.root / c).iterdir()):
                if p.suffix.lower() in IMG_EXTENSIONS:
                    self.samples.append((str(p), self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def load(self, idx: int) -> Tuple[np.ndarray, int]:
        path, label = self.samples[idx]
        return _decode_resize(path, self.size), label

    def load_batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        paths = [self.samples[i][0] for i in indices]
        labels = np.asarray([self.samples[i][1] for i in indices], np.int32)
        return _decode_resize_batch(paths, self.size), labels


class PairedFolder:
    """(distorted, clean) pairs matched by relative path with ``.png``
    fallback (ref:07:44-55)."""

    def __init__(self, clean_root: str, distorted_root: str,
                 size: int = configs.IMAGE_SIZE,
                 exts: Sequence[str] = (".ppm",)):
        self.size = size
        clean_root = Path(clean_root)
        distorted_root = Path(distorted_root)
        clean_files: List[Path] = []
        for ext in exts:
            clean_files += list(clean_root.glob(f"*/*{ext}"))
        self.pairs: List[Tuple[str, str]] = []
        for c_path in sorted(clean_files):
            rel = c_path.relative_to(clean_root)
            d_path = distorted_root / rel
            if not d_path.exists():
                d_path = d_path.with_suffix(".png")
            if d_path.exists():
                self.pairs.append((str(d_path), str(c_path)))

    def __len__(self):
        return len(self.pairs)

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        d, c = self.pairs[idx]
        return (_decode_resize(d, self.size), _decode_resize(c, self.size))

    def load_batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        d_paths = [self.pairs[i][0] for i in indices]
        c_paths = [self.pairs[i][1] for i in indices]
        return (_decode_resize_batch(d_paths, self.size),
                _decode_resize_batch(c_paths, self.size))


def train_val_split(n: int, train_frac: float, seed: int = 0):
    """Random index split like torch.random_split (ref:05:35-37)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    k = int(train_frac * n)
    return perm[:k], perm[k:]


def _load_many(dataset, indices, workers: int):
    if workers <= 1:
        return [dataset.load(i) for i in indices]
    with cf.ThreadPoolExecutor(workers) as ex:
        return list(ex.map(dataset.load, indices))


def _load_chunk(dataset, indices, workers: int):
    """Load one batch as stacked columns, preferring the dataset's native
    batch loader (C++ threaded decode) over per-item Python loads."""
    load_batch = getattr(dataset, "load_batch", None)
    if load_batch is not None:
        try:
            return load_batch(indices)
        except Exception:
            pass
    items = _load_many(dataset, indices, workers)
    cols = list(zip(*items))
    return tuple(
        np.stack(c) if isinstance(c[0], np.ndarray) else np.asarray(c)
        for c in cols
    )


def batches(
    dataset,
    indices: Optional[np.ndarray] = None,
    batch_size: int = 32,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    workers: int = 8,
    prefetch: int = 2,
    epochs: Optional[int] = 1,
    transform=None,
) -> Iterator:
    """Epoch-based batch iterator with background prefetch.

    Yields tuples of stacked numpy arrays — ``(images, labels)`` for
    ImageFolder, ``(bad, clean)`` for PairedFolder. cv2 decode+resize run in
    a thread pool (cv2 releases the GIL), standing in for the reference's
    DataLoader worker processes (ref:05:39-40, 14:213).

    ``transform`` (batch tuple -> batch tuple) runs in the PRODUCER thread
    — pass ``jax.device_put`` (or a sharded placement) there to overlap
    host->device upload with the consumer's device compute.
    """
    if indices is None:
        indices = np.arange(len(dataset))
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that still honors early consumer exit."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        # Any decode/transform failure is shipped to the consumer and
        # re-raised there: a bare daemon-thread death would leave the
        # consumer blocked on q.get() forever (hangs multi-hour unattended
        # runs on one corrupt image instead of failing loudly).
        try:
            rng = np.random.default_rng(seed)
            epoch = 0
            while epochs is None or epoch < epochs:
                order = rng.permutation(indices) if shuffle else indices
                limit = (len(order) // batch_size * batch_size
                         if drop_remainder else len(order))
                for s in range(0, limit, batch_size):
                    if stop.is_set():
                        return
                    chunk = order[s:s + batch_size]
                    item = _load_chunk(dataset, chunk, workers)
                    if transform is not None:
                        item = transform(item)
                    if not _put(item):
                        return
                epoch += 1
            _put(None)
        except BaseException as e:  # noqa: BLE001 — relayed, not swallowed
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def env_data_root() -> str:
    """Resolve the GTSRB Training tree: $TSR_GTSRB_DIR or the reference's
    default relative path."""
    return os.environ.get("TSR_GTSRB_DIR", DEFAULT_ROOT)
