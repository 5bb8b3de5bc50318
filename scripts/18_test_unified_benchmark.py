"""Judge accuracy over {clean, compound, unified-restored} (ref:18), plus
the fully-fused on-device variant (no restored tree on disk needed)."""

from _common import (PROCESSED, RESTORED, add_int8_flag,
                     add_resize_flag, base_parser,
                     ensure_clean_tree, judge_ckpt_path, maybe_int8_judge,
                     maybe_int8_restorer, mesh_from_args, unified_ckpt_path)

from tsr_tpu import eval as tsr_eval
from tsr_tpu import zoo
from tsr_tpu.utils import reporting


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default=None)
    p.add_argument("--unified", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--fused", action="store_true",
                   help="restore on the fly inside the eval graph instead "
                        "of reading data/restored from disk")
    add_int8_flag(p)
    add_resize_flag(p)
    args = p.parse_args()
    args.model = args.model or judge_ckpt_path(args)
    args.unified = args.unified or unified_ckpt_path(args)
    clean = ensure_clean_tree(args)

    import os

    from tsr_tpu.data import gtsrb
    ncls = args.num_classes or len(gtsrb.ImageFolder(clean).classes)
    judge, jv = zoo.load_model("vgg16", args.model, args.image_size,
                               num_classes=ncls)
    japply, jv = maybe_int8_judge(args, judge, jv)
    mesh = mesh_from_args(args)

    results = {}
    for name, path in (("Clean", clean),
                       ("Compound (Bad)", f"{PROCESSED}/Compound")):
        if not os.path.exists(path):
            print(f"Skipping {name}: {path} not found")
            continue
        r = tsr_eval.evaluate_directory(
            japply, jv, path, batch_size=args.batch_size,
            size=args.image_size, resize=args.resize)
        results[name] = r["top1"]
        print(f"Result [{name}] Accuracy: {r['top1'] * 100:.2f}% "
              f"({r['images_per_sec']} img/s)")

    if args.fused:
        resunet, rv = zoo.load_model("resunet", args.unified,
                                     args.image_size)
        rapply, rv = maybe_int8_restorer(args, resunet, rv, unified=True)
        r = tsr_eval.evaluate_directory(
            japply, jv, f"{PROCESSED}/Compound",
            batch_size=args.batch_size, size=args.image_size, mesh=mesh,
            restorer_apply=rapply, restorer_vars=rv, resize=args.resize)
        results["Unified Restored (fused)"] = r["top1"]
        print(f"Result [Unified Restored (fused)] Accuracy: "
              f"{r['top1'] * 100:.2f}%")
    elif os.path.exists(f"{RESTORED}/Compound"):
        r = tsr_eval.evaluate_directory(
            japply, jv, f"{RESTORED}/Compound",
            batch_size=args.batch_size, size=args.image_size,
            mesh=mesh, resize=args.resize)
        results["Unified Restored"] = r["top1"]
        print(f"Result [Unified Restored] Accuracy: {r['top1'] * 100:.2f}%")

    print(reporting.accuracy_report(
        results, "Final Test Report (Unified Model)"))


if __name__ == "__main__":
    main()
