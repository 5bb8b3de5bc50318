"""Cascade stress diagnostic: per-stage judge confidence AND PSNR-vs-clean.

The ref:13 demo reports only mean confidence at clean/bad/restored
(ref:13:226-238). When the cascade misbehaves, that's not enough to tell
*why*: a confidence drop after restoration can mean the judge is brittle
(image fine, conf low) or the restorers over-correct (image damaged).
This harness scores every one of the 7 stages with both the judge's mean
confidence and mean PSNR against the clean 224 batch, so the two failure
modes separate.

Round-3 use: A/B the identity-anchored specialized restorers
(scripts/07 --identity-frac) against the reference-exact severe-only
recipe. Exits 0; prints one JSON line with the per-stage table.

Usage:
    python benchmarks/cascade_diag.py --work /tmp/tsr_calib16 \
        --judge /tmp/tsr_calib16/judge --restorers /tmp/tsr_ab_id \
        --num-samples 32
"""

from __future__ import annotations

import argparse
import json
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsr_tpu import configs, pipeline, zoo  # noqa: E402
from tsr_tpu.data import gtsrb  # noqa: E402
from tsr_tpu.ops import image as image_ops  # noqa: E402
from tsr_tpu.utils import profiling  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="/tmp/tsr_calib16",
                   help="calibration work dir (expects <work>/clean)")
    p.add_argument("--clean-dir", default=None,
                   help="explicit clean tree (overrides <work>/clean)")
    p.add_argument("--judge", default=None,
                   help="judge checkpoint (default <work>/judge)")
    p.add_argument("--restorers", default=None,
                   help="dir holding restoration_{noise,fog,blur} "
                        "checkpoints (default: shipping checkpoints/)")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--num-samples", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import cv2
    import jax

    from tsr_tpu.ops import distortions

    profiling.honor_cpu_request()
    profiling.enable_compilation_cache()
    clean_root = Path(args.clean_dir or Path(args.work) / "clean")
    judge_path = args.judge or str(Path(args.work) / "judge")
    ncls = len(gtsrb.ImageFolder(clean_root).classes)
    judge, jv = zoo.load_model("vgg16", judge_path, args.image_size,
                               num_classes=ncls)
    rdir = Path(args.restorers) if args.restorers else Path("checkpoints")
    # per-task modules: each checkpoint's config may rebuild a different
    # architecture (e.g. input_minmax on the fog restorer)
    restorer_apply, restorer_vars = {}, {}
    for task in ("noise", "fog", "blur"):
        cand = [rdir / f"restoration_{task}", rdir / task]
        path = next((c for c in cand if c.exists()), None)
        assert path is not None, f"no {task} restorer under {rdir}"
        m, v = zoo.load_model("simple_unet", str(path), args.image_size)
        restorer_apply[task] = m.apply
        restorer_vars[task] = v

    files = sorted(f for f in clean_root.glob("*/*")
                   if f.suffix.lower() in gtsrb.IMG_EXTENSIONS)
    random.seed(args.seed)
    picks = random.sample(files, min(args.num_samples, len(files)))

    mild = configs.MildConfig()
    key = jax.random.PRNGKey(args.seed)
    stage_imgs = {name: [] for name in
                  ("Clean", "+ Blur", "+ Fog", "+ Noise (final bad)")}
    for f in picks:
        native = np.ascontiguousarray(cv2.imread(str(f))[:, :, ::-1])
        key, kn = jax.random.split(key)
        blur = np.asarray(distortions.mild_blur(native, mild))
        fog = np.asarray(distortions.mild_fog(blur, mild))
        noise = np.asarray(distortions.mild_noise(fog, kn, mild))
        for name, img in (("Clean", native), ("+ Blur", blur),
                          ("+ Fog", fog), ("+ Noise (final bad)", noise)):
            stage_imgs[name].append(cv2.resize(
                img, (args.image_size, args.image_size),
                interpolation=cv2.INTER_LINEAR))
    stages = [(name, np.stack(imgs)) for name, imgs in stage_imgs.items()]
    clean224 = stages[0][1]

    out = pipeline.cascade_stress(
        clean224, restorer_apply, restorer_vars, judge.apply, jv,
        jax.random.PRNGKey(args.seed), precomputed_stages=stages)

    table = {}
    for (name, img), conf in zip(out["stages"], out["confidences"]):
        if img.dtype == np.uint8:
            u8 = img
        else:  # restored stages are clipped float01 copies
            u8 = (np.clip(np.asarray(img, np.float32), 0, 1)
                  * 255).astype(np.uint8)
        if name == "Clean":
            ps = None  # PSNR vs itself is infinite; keep the JSON strict
        else:
            vals = np.asarray(image_ops.psnr(u8, clean224))
            ps = round(float(vals[np.isfinite(vals)].mean()), 2)
        table[name] = {"conf": round(float(np.mean(conf)), 4),
                       "psnr_vs_clean": ps}
        print(f"{name:24s} conf={table[name]['conf']:.3f} "
              f"psnr={table[name]['psnr_vs_clean']}")
    mc = out["mean_confidence"]
    summary = {k: round(float(v), 4) for k, v in mc.items()}
    print("mean_confidence:", summary)
    net = summary.get("restored", 0) - summary.get("distorted", 0)
    print(f"net restored-confidence gain: {net:+.4f} "
          f"(ref:13 gets +0.103: 0.749 -> 0.852)")
    print(json.dumps({"stages": table, "mean_confidence": summary,
                      "net_gain": round(net, 4)}))


if __name__ == "__main__":
    main()
