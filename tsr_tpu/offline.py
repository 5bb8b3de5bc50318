"""Offline dataset generation: distorted file trees from clean file trees.

TPU-batched equivalent of the reference's offline generators (ref:02/03/04
and ref:16): read each ``<class>/<img>`` from the clean tree, distort at
**native resolution** (the reference distorts before its transforms resize,
so blur strength is relative to native pixels), and write to a mirrored
tree (``.ppm`` kept for noise/blur/fog per ref:02:47-54; ``.png`` for
compound per ref:16:55).

Native sizes vary per image, so images are **bucketed**: reflect-101-padded
up to the next bucket size, distorted as a batch, and cropped back. For
pointwise distortions the pad is irrelevant; for blur, reflect-101 padding
composes exactly with filter2d's own reflect-101 border, so the cropped
result equals native-size processing. One jit compilation per bucket instead
of per shape.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Tuple

import jax
import numpy as np

from tsr_tpu import configs
from tsr_tpu.data import gtsrb
from tsr_tpu.ops import distortions

BUCKETS = (32, 48, 64, 96, 128, 160, 192, 224, 256)


def _bucket(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return ((n + 31) // 32) * 32


def _pad_reflect(img: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = h - img.shape[0], w - img.shape[1]
    if ph == 0 and pw == 0:
        return img
    # Tile reflect-101 padding if the image is smaller than the pad needs.
    # A dimension of 1 can't reflect (dim-1 == 0 pad is a no-op and would
    # spin this loop forever on a degenerate 1xN crop) — edge-pad it first.
    out = img
    if out.shape[0] == 1 or out.shape[1] == 1:
        out = np.pad(out, ((0, int(out.shape[0] == 1)),
                           (0, int(out.shape[1] == 1)), (0, 0)),
                     mode="edge")
    while out.shape[0] < h or out.shape[1] < w:
        eh = min(h - out.shape[0], out.shape[0] - 1)
        ew = min(w - out.shape[1], out.shape[1] - 1)
        out = np.pad(out, ((0, max(eh, 0)), (0, max(ew, 0)), (0, 0)),
                     mode="reflect")
    return out[:h, :w]


KINDS: Dict[str, Tuple[Callable, bool, str]] = {}


def _register_kinds():
    """kind -> (fn(batch_u8, key) -> batch_u8, needs_key, out_suffix)."""
    KINDS["noise"] = (
        lambda x, k: distortions.add_gaussian_noise(
            x, k, var=configs.NoiseConfig().var),
        True, None)
    # blur runs batched WITHOUT the final min-max renormalize (ref:03:29):
    # that stage is per-image over native pixels only, so it must run after
    # the bucket pad is cropped off (on low-contrast images the pad's blur
    # halo would shift the per-image min/max) — see _POST below.
    KINDS["blur"] = (
        lambda x, k: distortions.apply_motion_blur(
            x, configs.BlurConfig().degree, configs.BlurConfig().angle,
            minmax_normalize=False),
        False, None)
    KINDS["fog"] = (
        lambda x, k: distortions.add_fog(
            x, k, fog_intensity=configs.FogConfig().intensity),
        True, None)
    KINDS["compound"] = (
        lambda x, k: distortions.apply_compound_distortion(x, k),
        True, ".png")

    # Strength-jittered variants (--strength-jitter on scripts 02/03/04):
    # same per-type distortion, but the strength is drawn per image so the
    # trained restorer generalizes across severities. Ranges bracket the
    # reference's own operating points — severe offline trees (noise
    # var=0.02 ref:02:23, blur degree=12 ref:03:34, fog intensity=0.8
    # ref:04:42) AND the mild cascade stress (0.01 / 5 / 0.1,
    # ref:13:33-56) — because ref:13 runs the severe-trained restorers on
    # mild inputs and ours over-correct there (RESULTS.md cascade A/B).
    import jax.numpy as jnp

    def _noise_rand(x, k):
        kv, kn = jax.random.split(k)
        var = jax.random.uniform(
            kv, (x.shape[0], 1, 1, 1), jnp.float32, 0.005, 0.03)
        return distortions.add_gaussian_noise(x, kn, var=var)

    def _fog_rand(x, k):
        # per-image intensity; t = 1 - i (the mild chain's form,
        # ref:13:51), spanning t in [0.15, 0.95] before the default clip
        intensity = jax.random.uniform(
            k, (x.shape[0], 1, 1, 1), jnp.float32, 0.05, 0.85)
        return distortions.add_fog(x, None, fog_intensity=intensity,
                                   t_jitter=None)

    def _blur_rand(x, k):
        # no per-image min-max epilogue: the jittered tree trains cascade
        # restorers whose deployment inputs (ref:13:40-47 mild blur) are
        # not renormalized either, unlike the severe ref:03:29 tree
        from tsr_tpu.ops import blur as blur_ops
        from tsr_tpu.ops import image as image_ops
        kd, ka = jax.random.split(k)
        b = x.shape[0]
        degrees = jax.random.randint(
            kd, (b,), 4, distortions.MAX_BLUR_DEGREE + 1)
        angles = jax.random.uniform(ka, (b,), jnp.float32, 0.0, 360.0)
        kernels = blur_ops.motion_blur_kernels(
            degrees, angles, max_degree=distortions.MAX_BLUR_DEGREE)
        blurred = blur_ops.filter2d(jnp.asarray(x, jnp.float32), kernels)
        return image_ops.saturate_uint8(blurred, round=True)

    KINDS["noise_rand"] = (_noise_rand, True, None)
    KINDS["fog_rand"] = (_fog_rand, True, None)
    KINDS["blur_rand"] = (_blur_rand, True, None)


_register_kinds()


def _minmax_u8_host(img_u8: np.ndarray) -> np.ndarray:
    """``cv2.normalize(x, x, 0, 255, NORM_MINMAX)`` on one native-size uint8
    image (ref:03:29): joint min/max over pixels and channels, cvRound."""
    lo, hi = int(img_u8.min()), int(img_u8.max())
    if hi <= lo:
        return np.zeros_like(img_u8)
    scaled = (img_u8.astype(np.float32) - lo) * (255.0 / (hi - lo))
    return np.clip(np.rint(scaled), 0, 255).astype(np.uint8)


# per-image host-side epilogue applied after the bucket pad is cropped
_POST = {"blur": _minmax_u8_host}


def generate_tree(
    src_dir: str,
    dst_dir: str,
    kind: str,
    seed: int = 0,
    batch_size: int = 256,
    log: Callable[[str], None] = print,
) -> int:
    """Distort every image under ``src_dir`` into ``dst_dir`` (class tree
    preserved). Returns the number of images written."""
    import cv2

    fn, needs_key, suffix = KINDS[kind]
    src = Path(src_dir)
    dst = Path(dst_dir)
    files = sorted(
        p for p in src.glob("*/*") if p.suffix.lower() in gtsrb.IMG_EXTENSIONS
    )
    log(f"Found {len(files)} images, generating '{kind}' data...")

    # group by bucket
    groups: Dict[Tuple[int, int], List[Tuple[Path, np.ndarray]]] = {}
    for p in files:
        img = cv2.imread(str(p))
        if img is None:
            continue
        img = np.ascontiguousarray(img[:, :, ::-1])  # BGR->RGB
        b = (_bucket(img.shape[0]), _bucket(img.shape[1]))
        groups.setdefault(b, []).append((p, img))

    key = jax.random.PRNGKey(seed)
    written = 0
    jfn = jax.jit(fn) if needs_key else jax.jit(lambda x, k: fn(x, None))
    for (bh, bw), items in sorted(groups.items()):
        for s in range(0, len(items), batch_size):
            chunk = items[s:s + batch_size]
            batch = np.stack(
                [_pad_reflect(img, bh, bw) for _, img in chunk])
            key, sub = jax.random.split(key)
            out = np.asarray(jfn(batch, sub))
            post = _POST.get(kind)
            for (p, img), o in zip(chunk, out):
                h, w = img.shape[:2]
                rel = p.relative_to(src)
                outp = dst / rel
                if suffix:
                    outp = outp.with_suffix(suffix)
                outp.parent.mkdir(parents=True, exist_ok=True)
                crop = o[:h, :w]
                if post is not None:
                    crop = post(crop)
                cv2.imwrite(str(outp), crop[:, :, ::-1])
                written += 1
    # Provenance marker: training scripts read it to record whether a
    # restorer saw reference-exact severities (ref:02/03/04 fixed
    # strengths) or the jittered "*_rand" variants, so demo reports can
    # state which cascade variant (RESULTS.md A/B/B'/C) their restorers
    # represent instead of leaving it implicit.
    import json

    dst.mkdir(parents=True, exist_ok=True)
    (dst / ".distortion").write_text(
        json.dumps({"kind": kind, "seed": seed, "images": written}))
    log(f"Done: {written} images -> {dst}")
    return written
