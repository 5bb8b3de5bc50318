"""Calibration driver for the GTSRB-profile synthetic stand-in.

The reference's published judge accuracies (reference README.md:92-110,
BASELINE.md) define a distortion-vulnerability *ordering* that the
synthetic benchmark must reproduce before any restoration claim is
meaningful:

    clean ~99.96%  >>  fog 61.1%  >  blur 55.6%  >  noise 26.8%
    >>  compound 5.8%

This script builds a fresh stand-in tree, generates the four distorted
trees on-device, trains the BN judge, and scores all five conditions —
printing the profile against the target bands (VERDICT.md round-1 task 1:
clean >=99, noise 20-40, fog 50-70, blur 45-65, compound <10).

Usage (real TPU):
    python benchmarks/calibrate_standin.py --work /tmp/tsr_calib \
        --classes 43 --per-class 60 --epochs 5
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsr_tpu import configs, offline, zoo  # noqa: E402
from tsr_tpu import eval as tsr_eval  # noqa: E402
from tsr_tpu.data import gtsrb, synthetic  # noqa: E402
from tsr_tpu.train import common, loops  # noqa: E402
from tsr_tpu.utils import profiling  # noqa: E402

TARGETS = {  # name -> (lo, hi) target band, from reference README.md:92-110
    "clean": (0.99, 1.001),
    "noise": (0.20, 0.40),
    "blur": (0.45, 0.65),
    "fog": (0.50, 0.70),
    "compound": (0.0, 0.10),
}
REF = {"clean": 0.9996, "noise": 0.2682, "blur": 0.5557, "fog": 0.6107,
       "compound": 0.0578}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="/tmp/tsr_calib")
    p.add_argument("--classes", type=int, default=43)
    p.add_argument("--per-class", type=int, default=60)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--size-jitter", type=float, default=0.35)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--optimizer", default="adamw",
                   help="the calibration judge just needs to be "
                        "well-trained; AdamW converges from scratch in "
                        "~20 epochs where the ref's SGD recipe (built for "
                        "ImageNet init) does not")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True,
                   help="bfloat16 judge compute (default; the calibration "
                        "loop is throughput-bound)")
    p.add_argument("--f32", dest="bf16", action="store_false")
    p.add_argument("--no-batchnorm", action="store_true",
                   help="plain VGG16 (the ref's exact architecture) "
                        "instead of the BN variant — for the from-scratch "
                        "ablation table")
    p.add_argument("--calib", action="append", default=[],
                   metavar="KEY=VAL",
                   help="override a synthetic.CALIB knob, e.g. "
                        "--calib gain_pow=2.1 (repeatable)")
    p.add_argument("--keep", action="store_true",
                   help="reuse existing trees/judge instead of rebuilding")
    p.add_argument("--skip-train", action="store_true",
                   help="reuse the existing judge checkpoint")
    args = p.parse_args()

    for kv in args.calib:
        k, v = kv.split("=", 1)
        assert k in synthetic.CALIB, f"unknown CALIB knob {k}"
        synthetic.CALIB[k] = (tuple(float(x) for x in v.split(","))
                              if "," in v else float(v))

    profiling.enable_compilation_cache()
    work = Path(args.work)
    clean = work / "clean"
    if not args.keep and work.exists():
        shutil.rmtree(work)
    if not clean.exists():
        t0 = time.time()
        synthetic.write_image_tree(
            str(clean), num_classes=args.classes, per_class=args.per_class,
            size=args.size, seed=args.seed, size_jitter=args.size_jitter)
        print(f"[tree] {args.classes}x{args.per_class} in "
              f"{time.time() - t0:.1f}s")

    trees = {"clean": clean}
    for kind in ("noise", "blur", "fog", "compound"):
        dst = work / kind
        trees[kind] = dst
        if not dst.exists():
            offline.generate_tree(str(clean), str(dst), kind,
                                  seed=args.seed + 1)

    ckpt_path = work / "judge"
    ds = gtsrb.ImageFolder(str(clean), size=args.image_size)
    ncls = len(ds.classes)
    if not args.skip_train or not ckpt_path.exists():
        cfg = configs.JudgeTrainConfig(
            batch_size=args.batch_size, epochs=args.epochs,
            learning_rate=args.lr, optimizer=args.optimizer,
            seed=args.seed)
        import jax.numpy as jnp
        judge, variables = zoo.build_judge(
            num_classes=ncls, use_batchnorm=not args.no_batchnorm,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            size=args.image_size)
        state = common.TrainState.create(
            judge.apply, variables, common.judge_optimizer(cfg))
        tr, va = gtsrb.train_val_split(len(ds), cfg.train_split, cfg.seed)
        t0 = time.time()
        images, labels = ds.load_batch(range(len(ds)))
        print(f"[data] loaded {len(ds)} imgs in {time.time() - t0:.1f}s")
        t0 = time.time()
        loops.train_judge_on_device(
            state, images, labels, tr, va, cfg, save_path=str(ckpt_path),
            ckpt_config={"kind": "vgg16", "num_classes": ncls,
                         "use_batchnorm": not args.no_batchnorm})
        print(f"[judge] trained in {time.time() - t0:.1f}s")

    judge, jv = zoo.load_model("vgg16", str(ckpt_path), args.image_size,
                               num_classes=ncls,
                               use_batchnorm=not args.no_batchnorm)
    profile = {}
    for name, path in trees.items():
        r = tsr_eval.evaluate_directory(
            judge.apply, jv, str(path), batch_size=args.batch_size,
            size=args.image_size)
        profile[name] = r["top1"]
        lo, hi = TARGETS[name]
        ok = "OK " if lo <= r["top1"] <= hi else "MISS"
        print(f"  [{ok}] {name:9s} {r['top1'] * 100:6.2f}%   "
              f"target [{lo * 100:.0f},{hi * 100:.0f}]  ref "
              f"{REF[name] * 100:.2f}%")

    n_ok = sum(TARGETS[k][0] <= v <= TARGETS[k][1]
               for k, v in profile.items())
    print(json.dumps({"profile": profile, "bands_hit": n_ok,
                      "calib": synthetic.CALIB}))


if __name__ == "__main__":
    main()
