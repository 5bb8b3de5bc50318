"""Judge-from-scratch ablation (VERDICT round-1 task 10).

The reference fine-tunes an ImageNet-pretrained plain VGG16 with
SGD(lr=1e-3, momentum=0.9) for 10 epochs (ref:05:47-60). Offline, ImageNet
weights are unobtainable, so the question is what the from-scratch recipe
must look like. This trains the judge under several recipes on an existing
calibrated stand-in tree and reports clean top-1, producing the ablation
table for RESULTS.md:

  ref-recipe      plain VGG16, SGD 1e-3, 10 ep   (the reference, no init)
  ref-recipe-long plain VGG16, SGD 1e-3, 80 ep
  bn-sgd          VGG16-BN,    SGD 1e-3, 80 ep
  bn-adamw        VGG16-BN,  AdamW 3e-4, 80 ep   (round-1 recipe, retired)
  plain-adamw     plain VGG16, AdamW 3e-4 + warmup, 60 ep  (SHIPPING recipe
                  — the ref's exact architecture; see RESULTS.md)

Usage: python benchmarks/judge_ablation.py --work /tmp/tsr_calib9
       (expects <work>/clean from calibrate_standin.py)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from tsr_tpu import configs, zoo  # noqa: E402
from tsr_tpu import eval as tsr_eval  # noqa: E402
from tsr_tpu.data import gtsrb  # noqa: E402
from tsr_tpu.train import common, loops  # noqa: E402
from tsr_tpu.utils import profiling  # noqa: E402

RECIPES = {
    "ref-recipe": dict(batchnorm=False, optimizer="sgd", lr=1e-3, epochs=10),
    "ref-recipe-long": dict(batchnorm=False, optimizer="sgd", lr=1e-3,
                            epochs=80),
    "bn-sgd": dict(batchnorm=True, optimizer="sgd", lr=1e-3, epochs=80),
    "bn-adamw": dict(batchnorm=True, optimizer="adamw", lr=3e-4, epochs=80),
    "plain-adamw": dict(batchnorm=False, optimizer="adamw", lr=3e-4,
                        epochs=60),
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="/tmp/tsr_calib9")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--only", default=None,
                   help="comma-separated recipe subset")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    profiling.enable_compilation_cache()
    clean = Path(args.work) / "clean"
    assert clean.exists(), f"{clean} missing — run calibrate_standin first"
    ds = gtsrb.ImageFolder(str(clean), size=args.image_size)
    ncls = len(ds.classes)
    images, labels = ds.load_batch(range(len(ds)))
    tr, va = gtsrb.train_val_split(len(ds), 0.8, args.seed)

    names = (args.only.split(",") if args.only else list(RECIPES))
    results = {}
    for name in names:
        r = RECIPES[name]
        cfg = configs.JudgeTrainConfig(
            batch_size=args.batch_size, epochs=r["epochs"],
            learning_rate=r["lr"], optimizer=r["optimizer"],
            seed=args.seed)
        judge, variables = zoo.build_judge(
            num_classes=ncls, use_batchnorm=r["batchnorm"],
            dtype=jnp.bfloat16, size=args.image_size)
        state = common.TrainState.create(
            judge.apply, variables, common.judge_optimizer(cfg))
        t0 = time.time()
        logs = []
        state, best_val = loops.train_judge_on_device(
            state, images, labels, tr, va, cfg,
            log=lambda s: logs.append(s))
        # clean top-1 over the full tree with the FINAL state (matches the
        # reference's protocol of scoring the Training tree, ref:06:17)
        f32_judge, _ = zoo.build_judge(num_classes=ncls,
                                       use_batchnorm=r["batchnorm"],
                                       size=args.image_size)
        res = tsr_eval.evaluate_directory(
            f32_judge.apply,
            {"params": jax.device_get(state.params),
             **({"batch_stats": jax.device_get(state.batch_stats)}
                if state.batch_stats is not None else {})},
            str(clean), batch_size=args.batch_size, size=args.image_size)
        results[name] = {"clean_top1": res["top1"], "best_val": best_val,
                         "train_s": round(time.time() - t0, 1)}
        print(f"[{name}] clean {res['top1'] * 100:.2f}%  "
              f"best-val {best_val * 100:.2f}%  "
              f"({results[name]['train_s']}s)  last: {logs[-2:]}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
