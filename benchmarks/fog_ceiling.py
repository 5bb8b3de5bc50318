"""Oracle-affine ceiling for fog restoration (ref:04 / ref:07 Fog task).

Fog is globally affine: ``I = J*t + A*(1-t)`` with one random ``t`` per
image (ref:04:24-28). A restorer that perfectly estimated ``(t, A)``
would invert it exactly up to uint8 quantization, so the *per-image
least-squares affine fit against the clean target* is the ceiling for
the whole model family "estimate the fog parameters and undo them" —
no network that restores fog by global contrast correction can beat it.
This tool measures that ceiling (PSNR + judge top-1) next to the
distorted tree and the shipped UNet's restored tree, so the fog
restoration gap (RESULTS.md: +2.1 pts vs the reference's +29.1 on
photographic GTSRB) can be attributed: if oracle-affine accuracy is far
above the UNet's, the restorer undertrains; if it is close, the gap is
structural to the stand-in (the judge's fog failures happen where the
affine inverse cannot help — quantization-crushed low-t images).

Usage (inside a demo work dir, e.g. /tmp/tsr_demo_r4):
    TSR_CKPT_DIR=./ckpt python benchmarks/fog_ceiling.py
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsr_tpu import zoo  # noqa: E402
from tsr_tpu.data import gtsrb  # noqa: E402
from tsr_tpu.ops import image as image_ops  # noqa: E402


def _affine_fit(f, c, per_channel: bool):
    """Least-squares ``a*f + b ~= c`` per image (axes HW or HWC shared)."""
    import jax.numpy as jnp

    ax = (1, 2) if per_channel else (1, 2, 3)
    mf = jnp.mean(f, axis=ax, keepdims=True)
    mc = jnp.mean(c, axis=ax, keepdims=True)
    var = jnp.mean((f - mf) ** 2, axis=ax, keepdims=True)
    cov = jnp.mean((f - mf) * (c - mc), axis=ax, keepdims=True)
    a = cov / jnp.maximum(var, 1e-8)
    b = mc - a * mf
    return jnp.clip(a * f + b, 0.0, 1.0)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clean", default="./data/gtsrb/Training")
    p.add_argument("--fog", default="./data/processed/Fog")
    p.add_argument("--restored", default="./data/restored/Fog",
                   help="shipped UNet output tree (optional comparison)")
    p.add_argument("--judge", default=None,
                   help="judge ckpt (default: $TSR_CKPT_DIR/vgg16_baseline)")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    pairs = gtsrb.PairedFolder(args.clean, args.fog, size=args.image_size)
    assert len(pairs), f"no (clean, fog) pairs under {args.clean}/{args.fog}"
    classes = sorted({Path(c).parent.name for _, c in pairs.pairs})
    cls_id = {name: i for i, name in enumerate(classes)}
    labels = np.array([cls_id[Path(c).parent.name] for _, c in pairs.pairs])

    judge_path = args.judge or os.path.join(
        os.environ.get("TSR_CKPT_DIR", "./checkpoints"), "vgg16_baseline")
    judge, jv = zoo.load_model("vgg16", judge_path, args.image_size,
                               num_classes=len(classes))
    jv = jax.device_put(jv)

    @jax.jit
    def step(v, fog_u8, clean_u8):
        f = image_ops.to_float01(fog_u8)
        c = image_ops.to_float01(clean_u8)
        outs = {}
        lo = jnp.min(f, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(f, axis=(1, 2, 3), keepdims=True)
        variants = {
            "distorted": f,
            "oracle_affine": _affine_fit(f, c, per_channel=False),
            "oracle_affine_pc": _affine_fit(f, c, per_channel=True),
            # NO oracle needed: per-image min-max stretch (the reference's
            # own cv2 NORM_MINMAX tool, ref:03:29). If clean images span
            # [~0, ~1], this analytically inverts I = J*t + A*(1-t).
            "minmax": (f - lo) / jnp.maximum(hi - lo, 1e-6),
            "clean": c,
        }
        for name, x in variants.items():
            mse = jnp.mean((x - c) ** 2, axis=(1, 2, 3))
            logits = judge.apply(v, image_ops.imagenet_normalize(x),
                                 train=False)
            outs[name] = (jnp.argmax(logits, -1), mse)
        return outs

    n = len(pairs)
    preds = {k: [] for k in
             ("distorted", "oracle_affine", "oracle_affine_pc", "minmax", "clean")}
    mses = {k: [] for k in preds}
    for i in range(0, n, args.batch):
        idx = range(i, min(i + args.batch, n))
        fog_u8, clean_u8 = pairs.load_batch(idx)
        if len(fog_u8) < args.batch:  # keep one compiled shape
            pad = args.batch - len(fog_u8)
            fog_u8 = np.concatenate([fog_u8, np.zeros(
                (pad,) + fog_u8.shape[1:], fog_u8.dtype)])
            clean_u8 = np.concatenate([clean_u8, np.zeros(
                (pad,) + clean_u8.shape[1:], clean_u8.dtype)])
            out = step(jv, fog_u8, clean_u8)
            for k, (pr, ms) in out.items():
                preds[k].append(np.asarray(pr)[:len(idx)])
                mses[k].append(np.asarray(ms)[:len(idx)])
        else:
            out = step(jv, fog_u8, clean_u8)
            for k, (pr, ms) in out.items():
                preds[k].append(np.asarray(pr))
                mses[k].append(np.asarray(ms))

    result = {}
    for k in preds:
        pr = np.concatenate(preds[k])
        ms = np.concatenate(mses[k])
        psnr = float(np.mean(-10.0 * np.log10(np.maximum(ms, 1e-10))))
        result[k] = {"top1": float((pr == labels).mean()),
                     "psnr": None if k == "clean" else round(psnr, 2)}

    # shipped UNet tree, if present (accuracy only — PSNR is in RESULTS.md)
    if Path(args.restored).exists():
        ds = gtsrb.ImageFolder(args.restored, size=args.image_size)

        @jax.jit
        def pred_only(v, x):
            logits = judge.apply(v, image_ops.imagenet_normalize(
                image_ops.to_float01(x)), train=False)
            return jnp.argmax(logits, -1)

        hits = tot = 0
        for i in range(0, len(ds), args.batch):
            idx = range(i, min(i + args.batch, len(ds)))
            imgs, labs = ds.load_batch(idx)
            if len(imgs) < args.batch:
                imgs = np.concatenate([imgs, np.zeros(
                    (args.batch - len(imgs),) + imgs.shape[1:], imgs.dtype)])
            pr = np.asarray(pred_only(jv, imgs))[:len(idx)]
            hits += int((pr == np.asarray(labs)).sum())
            tot += len(idx)
        result["unet_restored"] = {"top1": hits / tot, "psnr": None}

    for k, r in result.items():
        psnr = f" psnr={r['psnr']:.2f}dB" if r["psnr"] is not None else ""
        print(f"{k:18s} top1={r['top1'] * 100:6.2f}%{psnr}")
    gap = result["oracle_affine"]["top1"] - result["distorted"]["top1"]
    print(f"oracle-affine recovers {gap * 100:+.2f} pts over distorted "
          f"(the reference's UNet recovers +29.1 on photographic GTSRB)")
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
