"""Judge accuracy over clean + 3 distorted + 3 restored trees (ref:09),
plus a fully-fused on-device variant: with ``--fused``, each task's
Restored row restores the Distorted tree inside the eval graph with the
specialized SimpleUNet checkpoint — no ``data/restored`` disk round-trip
(the reference re-reads restored PNGs, ref:09:15-26)."""

from _common import (PROCESSED, RESTORED, add_int8_flag,
                     add_resize_flag, base_parser,
                     ensure_clean_tree, judge_ckpt_path, maybe_int8_judge,
                     maybe_int8_restorer, mesh_from_args,
                     restorer_ckpt_path)

from tsr_tpu import eval as tsr_eval
from tsr_tpu import zoo
from tsr_tpu.utils import reporting


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--fused", action="store_true",
                   help="restore on the fly inside the eval graph from "
                        "the specialized checkpoints instead of reading "
                        "data/restored from disk")
    add_int8_flag(p)
    add_resize_flag(p)
    args = p.parse_args()
    args.model = args.model or judge_ckpt_path(args)
    clean = ensure_clean_tree(args)

    import os

    from tsr_tpu.data import gtsrb
    ncls = args.num_classes or len(gtsrb.ImageFolder(clean).classes)
    judge, jv = zoo.load_model("vgg16", args.model, args.image_size,
                               num_classes=ncls)
    japply, jv = maybe_int8_judge(args, judge, jv)
    mesh = mesh_from_args(args)

    def score(name, path, **kw):
        if not os.path.exists(path):
            print(f"Skipping {name}: {path} not found")
            return
        r = tsr_eval.evaluate_directory(
            japply, jv, path, batch_size=args.batch_size,
            size=args.image_size, mesh=mesh, resize=args.resize,
            **kw)
        results[name] = r["top1"]
        print(f"Result [{name}] Accuracy: {r['top1'] * 100:.2f}% "
              f"({r['images_per_sec']} img/s)")

    results = {}
    score("Clean (Original)", clean)
    for task in ("Noise", "Blur", "Fog"):
        score(f"{task} (Distorted)", f"{PROCESSED}/{task}")
        if args.fused:
            ckpt = restorer_ckpt_path(task, args)
            if not os.path.exists(ckpt):
                print(f"Skipping {task} (Restored, fused): {ckpt} "
                      "not found")
                continue
            unet, uv = zoo.load_model("simple_unet", ckpt,
                                      args.image_size)
            uapply, uv = maybe_int8_restorer(args, unet, uv)
            score(f"{task} (Restored, fused)", f"{PROCESSED}/{task}",
                  restorer_apply=uapply, restorer_vars=uv)
        else:
            score(f"{task} (Restored)", f"{RESTORED}/{task}")
    print(reporting.accuracy_report(
        results, "Final Test Report (Restoration)"))


if __name__ == "__main__":
    main()
