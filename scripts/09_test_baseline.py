"""Judge accuracy over clean + 3 distorted + 3 restored trees (ref:09)."""

from _common import (PROCESSED, RESTORED, base_parser, ensure_clean_tree,
                     judge_ckpt_path)

from tsr_tpu import eval as tsr_eval
from tsr_tpu import zoo
from tsr_tpu.utils import reporting


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=None)
    args = p.parse_args()
    args.model = args.model or judge_ckpt_path(args)
    clean = ensure_clean_tree(args)

    import os

    from tsr_tpu.data import gtsrb
    ncls = args.num_classes or len(gtsrb.ImageFolder(clean).classes)
    judge, jv = zoo.load_model("vgg16", args.model, args.image_size,
                               num_classes=ncls)
    test_dirs = {"Clean (Original)": clean}
    for task in ("Noise", "Blur", "Fog"):
        test_dirs[f"{task} (Distorted)"] = f"{PROCESSED}/{task}"
        test_dirs[f"{task} (Restored)"] = f"{RESTORED}/{task}"
    results = {}
    for name, path in test_dirs.items():
        if not os.path.exists(path):
            print(f"Skipping {name}: {path} not found")
            continue
        r = tsr_eval.evaluate_directory(
            judge.apply, jv, path, batch_size=args.batch_size,
            size=args.image_size)
        results[name] = r["top1"]
        print(f"Result [{name}] Accuracy: {r['top1'] * 100:.2f}%")
    print(reporting.accuracy_report(
        results, "Final Test Report (Restoration)"))


if __name__ == "__main__":
    main()
