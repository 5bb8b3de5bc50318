"""Judge accuracy over {clean, noisy, blurred, foggy} trees (ref:06)."""

from _common import (PROCESSED, add_int8_flag, add_resize_flag, base_parser,
                     ensure_clean_tree, judge_ckpt_path, maybe_int8_judge,
                     mesh_from_args)

from tsr_tpu import eval as tsr_eval
from tsr_tpu import zoo
from tsr_tpu.utils import reporting


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--batchnorm", action="store_true")
    add_int8_flag(p)
    add_resize_flag(p)
    args = p.parse_args()
    args.model = args.model or judge_ckpt_path(args)
    clean = ensure_clean_tree(args)

    import os

    from tsr_tpu.data import gtsrb
    ncls = args.num_classes or len(gtsrb.ImageFolder(clean).classes)
    judge, jv = zoo.load_model("vgg16", args.model, args.image_size,
                               num_classes=ncls,
                               use_batchnorm=args.batchnorm)
    japply, jv = maybe_int8_judge(args, judge, jv)
    mesh = mesh_from_args(args)
    test_dirs = {
        "Clean (Original)": clean,
        "Noisy": f"{PROCESSED}/Noise",
        "Blurred": f"{PROCESSED}/Blur",
        "Foggy": f"{PROCESSED}/Fog",
    }
    results = {}
    for name, path in test_dirs.items():
        if not os.path.exists(path):
            print(f"Skipping {name}: {path} not found")
            continue
        r = tsr_eval.evaluate_directory(
            japply, jv, path, batch_size=args.batch_size,
            size=args.image_size, mesh=mesh, resize=args.resize)
        results[name] = r["top1"]
        print(f"Result [{name}] Accuracy: {r['top1'] * 100:.2f}% "
              f"({r['images_per_sec']} img/s)")
    print(reporting.accuracy_report(results, "Final Test Report (Baseline 1)"))


if __name__ == "__main__":
    main()
