"""One comparable table for the three serving variants (VERDICT r4 task 8):

  unfused     restore_tree -> PNG tree on disk -> classify the tree
              (the reference's own 17 -> 18 shape, ref:17:73-99 +
              ref:18:35-53, here with the pipelined tree walk)
  bf16 fused  evaluate_directory with the restorer inside the eval graph
  int8 fused  same graph, PTQ restorer + judge (tsr_tpu/quant.py)

Runs all three against the SAME compound tree with the SAME judge +
unified-ResUNet checkpoints, so top-1 / img/s / PSNR line up in one table
instead of being scattered across RESULTS sections.

Inputs: --clean (tree), --compound (tree; generated from --clean via
tsr_tpu.offline if missing), --judge / --unified checkpoint dirs.
Prints one JSON line per variant + a summary table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clean", required=True)
    p.add_argument("--compound", default=None)
    p.add_argument("--judge", required=True)
    p.add_argument("--unified", required=True)
    p.add_argument("--restored-out", default=None,
                   help="where the unfused variant writes its tree "
                        "(default <compound>/../Restored_Compound)")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64,
                   help="eval harness batch (ref:06:41 uses 64)")
    p.add_argument("--restore-batch", type=int, default=None,
                   help="restore_tree batch (default: the r5 measured "
                        "optimum from benchmarks/restore_ab.py)")
    args = p.parse_args()

    from tsr_tpu import eval as tsr_eval
    from tsr_tpu import infer, offline, quant, zoo
    from tsr_tpu.data import gtsrb
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()

    clean = Path(args.clean)
    compound = Path(args.compound or (clean.parent / "Compound"))
    if not compound.exists():
        offline.generate_tree(str(clean), str(compound), "compound")
    restored = Path(args.restored_out
                    or (compound.parent / "Restored_Compound"))

    ncls = len(gtsrb.ImageFolder(str(clean)).classes)
    judge, jv = zoo.load_model("vgg16", args.judge, args.image_size,
                               num_classes=ncls)
    resunet, rv = zoo.load_model("resunet", args.unified, args.image_size)

    size = args.image_size
    rb = args.restore_batch or 64

    def unfused():
        t0 = time.perf_counter()
        rres = infer.restore_tree(
            resunet.apply, rv, str(compound), str(restored),
            clean_dir=str(clean), batch_size=rb, size=size,
            has_batch_stats=True, log=lambda s: None)
        t_restore = time.perf_counter() - t0
        t0 = time.perf_counter()
        eres = tsr_eval.evaluate_directory(
            judge.apply, jv, str(restored), batch_size=args.batch_size,
            size=size)
        t_eval = time.perf_counter() - t0
        n = rres["images"]
        return {"variant": "unfused (restore->disk->classify)",
                "top1": round(eres["top1"], 4), "n": n,
                "img_s_end_to_end": round(n / (t_restore + t_eval), 1),
                "img_s_restore": rres["images_per_sec"],
                "img_s_classify": eres["images_per_sec"],
                "psnr": round(rres.get("psnr", float("nan")), 2),
                "ssim": round(rres.get("ssim", float("nan")), 4),
                "restore_batch": rb}

    def fused_bf16():
        r = tsr_eval.evaluate_directory(
            judge.apply, jv, str(compound), batch_size=args.batch_size,
            size=size,
            restorer_apply=lambda v, x: resunet.apply(v, x, train=False),
            restorer_vars=rv)
        return {"variant": "bf16 fused (restore in eval graph)",
                "top1": round(r["top1"], 4), "n": r["n"],
                "img_s_end_to_end": r["images_per_sec"]}

    def fused_int8():
        rq_apply, rq = quant.quantized_restorer(resunet, rv)
        jq_apply, jq = quant.quantized_judge(judge, jv)
        r = tsr_eval.evaluate_directory(
            jq_apply, jq, str(compound), batch_size=args.batch_size,
            size=size, restorer_apply=rq_apply, restorer_vars=rq)
        return {"variant": "int8 fused (PTQ restorer+judge)",
                "top1": round(r["top1"], 4), "n": r["n"],
                "img_s_end_to_end": r["images_per_sec"]}

    rows = []
    for fn in (unfused, fused_bf16, fused_int8):
        fn()  # warmup pass: all compiles + relay first-touch out of band
        row = fn()
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\nvariant                                top-1    img/s (e2e)")
    for row in rows:
        print(f"{row['variant']:38s} {row['top1'] * 100:6.2f}%  "
              f"{row['img_s_end_to_end']:10.1f}")


if __name__ == "__main__":
    main()
