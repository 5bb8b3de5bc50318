"""Calibration driver for the GTSRB-profile synthetic stand-in.

The reference's published judge accuracies (reference README.md:92-110,
BASELINE.md) define a distortion-vulnerability *ordering* that the
synthetic benchmark must reproduce before any restoration claim is
meaningful:

    clean ~99.96%  >>  fog 61.1%  >  blur 55.6%  >  noise 26.8%
    >>  compound 5.8%

plus a sixth behavioral band from the cascade stress demo (ref:13): under
the MILD stress params (noise var 0.01 / blur 5 / fog 0.1, ref:13:33-56)
the reference judge's mean confidence drops to ~0.749 — room the cascade
then recovers (ref:13:226-238). A judge that ignores the mild regime
(conf ~1.0) can only be over-corrected by the restorers.

This script builds fresh stand-in trees, generates the four distorted
trees on-device, trains the judge, and scores all six conditions against
the target bands — optionally over multiple seeds (``--seeds N``),
reporting mean±std and gating on the mean. **Exit code is the number of
bands missed** (0 = acceptance), so it doubles as an acceptance gate
(VERDICT r2 task 1).

Usage (real TPU):
    python benchmarks/calibrate_standin.py --work /tmp/tsr_calib \
        --classes 43 --per-class 120 --epochs 60 --no-batchnorm --seeds 3
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

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
    # mean max-softmax confidence under ref:13's mild stress chain — the
    # reference judge lands at 0.749 (ref:13 report; README). Unit is
    # confidence, not accuracy.
    "mild_conf": (0.60, 0.85),
}
REF = {"clean": 0.9996, "noise": 0.2682, "blur": 0.5557, "fog": 0.6107,
       "compound": 0.0578, "mild_conf": 0.749}


def mild_stress_confidence(judge_apply, judge_vars, clean_root: Path,
                           image_size: int, seed: int, n_samples: int = 64,
                           batch_hint: int = 64) -> float:
    """Mean judge confidence on ref:13's mild Blur->Fog->Noise chain.

    Distortions apply at native resolution like scripts/13 (ref:13:147-169
    operates on the raw cv2 image); native sizes are bucketed to multiples
    of 8 so the jitted distortion graphs compile O(#buckets) times, not
    O(#images)."""
    import random as _random

    import jax

    from tsr_tpu.ops import distortions, image as image_ops

    try:
        import cv2

        def _imread(p):
            return cv2.imread(str(p))[:, :, ::-1]

        def _resize(img, s):
            return cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # PIL fallback
        from PIL import Image

        def _imread(p):
            return np.asarray(Image.open(p).convert("RGB"))

        def _resize(img, s):
            return np.asarray(
                Image.fromarray(img).resize((s, s), Image.BILINEAR))

    files = sorted(f for f in clean_root.glob("*/*")
                   if f.suffix.lower() in gtsrb.IMG_EXTENSIONS)
    _random.seed(seed)
    picks = _random.sample(files, min(n_samples, len(files)))

    mild = configs.MildConfig()
    key = jax.random.PRNGKey(seed)
    finals = []
    # bucket by native size (multiple of 8) to bound recompilation
    by_bucket: dict = {}
    for f in picks:
        native = np.ascontiguousarray(_imread(f))
        b = max(16, int(round(min(native.shape[:2]) / 8)) * 8)
        by_bucket.setdefault(b, []).append(_resize(native, b))
    for b, imgs in sorted(by_bucket.items()):
        x = np.stack(imgs)
        key, kn = jax.random.split(key)
        bad = np.asarray(distortions.mild_noise(
            distortions.mild_fog(distortions.mild_blur(x, mild), mild),
            kn, mild))
        finals.extend(_resize(img, image_size) for img in bad)

    import jax.numpy as jnp

    batch = np.stack(finals)
    confs = []
    for i in range(0, len(batch), batch_hint):  # chunked: bounds HBM use
        logits = judge_apply(
            judge_vars,
            image_ops.imagenet_normalize(
                image_ops.to_float01(batch[i:i + batch_hint])),
            train=False)
        confs.append(np.asarray(jnp.max(jax.nn.softmax(logits, -1), -1)))
    return float(np.mean(np.concatenate(confs)))


def run_once(args, seed: int) -> dict:
    """Build trees + train judge + score all six conditions for one seed."""
    work = Path(f"{args.work}_s{seed}" if args.seeds > 1 else args.work)
    clean = work / "clean"
    if not args.keep and work.exists():
        shutil.rmtree(work)
    n_expect = args.classes * args.per_class

    def incomplete(tree: Path) -> bool:
        # a relay outage can kill a run mid-build; --keep must never
        # silently reuse a partial tree
        if not tree.exists():
            return True
        n = len(list(tree.glob("*/*")))
        if n != n_expect:
            print(f"[tree] {tree} incomplete ({n}/{n_expect}); rebuilding")
            shutil.rmtree(tree)
            return True
        return False

    if incomplete(clean):
        t0 = time.time()
        synthetic.write_image_tree(
            str(clean), num_classes=args.classes, per_class=args.per_class,
            size=args.size, seed=seed, size_jitter=args.size_jitter)
        print(f"[tree s{seed}] {args.classes}x{args.per_class} in "
              f"{time.time() - t0:.1f}s")

    trees = {"clean": clean}
    for kind in ("noise", "blur", "fog", "compound"):
        dst = work / kind
        trees[kind] = dst
        if incomplete(dst):
            offline.generate_tree(str(clean), str(dst), kind,
                                  seed=seed + 1)

    ckpt_path = work / "judge"
    ds = gtsrb.ImageFolder(str(clean), size=args.image_size)
    ncls = len(ds.classes)
    if not (args.skip_train and ckpt_path.exists()):
        cfg = configs.JudgeTrainConfig(
            batch_size=args.batch_size, epochs=args.epochs,
            learning_rate=args.lr, optimizer=args.optimizer,
            seed=seed, label_smoothing=args.label_smoothing)
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
        print(f"[judge s{seed}] trained in {time.time() - t0:.1f}s")

    judge, jv = zoo.load_model("vgg16", str(ckpt_path), args.image_size,
                               num_classes=ncls,
                               use_batchnorm=not args.no_batchnorm)
    profile = {}
    for name, path in trees.items():
        r = tsr_eval.evaluate_directory(
            judge.apply, jv, str(path), batch_size=args.batch_size,
            size=args.image_size)
        profile[name] = r["top1"]
    profile["mild_conf"] = mild_stress_confidence(
        judge.apply, jv, clean, args.image_size, seed,
        n_samples=args.mild_samples)
    for name, v in profile.items():
        lo, hi = TARGETS[name]
        ok = "OK " if lo <= v <= hi else "MISS"
        print(f"  [{ok}] s{seed} {name:9s} {v * 100:6.2f}   "
              f"target [{lo * 100:.0f},{hi * 100:.0f}]  ref "
              f"{REF[name] * 100:.2f}")
    return profile


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
    p.add_argument("--seeds", type=int, default=1,
                   help="number of independent seeds (tree + training); "
                        ">1 reports mean±std and gates on the mean")
    p.add_argument("--mild-samples", type=int, default=64,
                   help="sample count for the ref:13 mild-confidence band")
    p.add_argument("--label-smoothing", type=float, default=0.0,
                   help="judge CE label smoothing (see scripts/05): the "
                        "confidence-scale lever for the mild_conf band")
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
    p.add_argument("--no-gate", action="store_true",
                   help="always exit 0 (report-only mode)")
    args = p.parse_args()

    for kv in args.calib:
        k, v = kv.split("=", 1)
        assert k in synthetic.CALIB, f"unknown CALIB knob {k}"
        synthetic.CALIB[k] = (tuple(float(x) for x in v.split(","))
                              if "," in v else float(v))

    profiling.honor_cpu_request()  # enables tiny CPU dry-runs of the driver
    profiling.enable_compilation_cache()

    runs = [run_once(args, args.seed + i) for i in range(args.seeds)]
    mean = {k: float(np.mean([r[k] for r in runs])) for k in TARGETS}
    std = {k: float(np.std([r[k] for r in runs])) for k in TARGETS}

    n_ok = 0
    print(f"=== mean over {args.seeds} seed(s) ===")
    for name in TARGETS:
        lo, hi = TARGETS[name]
        hit = lo <= mean[name] <= hi
        n_ok += hit
        print(f"  [{'OK ' if hit else 'MISS'}] {name:9s} "
              f"{mean[name] * 100:6.2f} ± {std[name] * 100:5.2f}   "
              f"target [{lo * 100:.0f},{hi * 100:.0f}]  ref "
              f"{REF[name] * 100:.2f}")
    # Informational second verdict under the stand-in's re-derived compound
    # band [0.10, 0.20] (docs/CALIBRATION.md "Round 4": the vector-rendered
    # stand-in has a measured template-group floor ~16%, so the reference's
    # photographic 5.78% band is structurally unreachable here). The exit
    # code below stays on the reference's LITERAL bands.
    rederived = dict(TARGETS, compound=(0.10, 0.20))
    n_re = sum(lo <= mean[k] <= hi for k, (lo, hi) in rederived.items())
    print(f"re-derived bands (compound [10,20], docs/CALIBRATION.md r4): "
          f"{n_re}/{len(rederived)}")
    print(json.dumps({"mean": mean, "std": std, "runs": runs,
                      "bands_hit": n_ok, "bands_total": len(TARGETS),
                      "bands_hit_rederived": n_re,
                      "calib": synthetic.CALIB}))
    missed = len(TARGETS) - n_ok
    sys.exit(0 if args.no_gate else missed)


if __name__ == "__main__":
    main()
