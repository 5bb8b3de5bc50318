"""Batched unified ResUNet restoration of the Compound tree (ref:17)."""

from _common import (PROCESSED, RESTORED, base_parser, ensure_clean_tree,
                     unified_ckpt_path)

from tsr_tpu import infer, zoo


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default=None)
    p.add_argument("--distorted-dir", default=f"{PROCESSED}/Compound")
    p.add_argument("--restored-dir", default=f"{RESTORED}/Compound")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--resize", default="device",
                   choices=["device", "host"],
                   help="see scripts/08 — device is the measured default")
    p.add_argument("--metrics", action="store_true",
                   help="also compute PSNR/SSIM vs the clean tree "
                        "(ref:17 computes none)")
    args = p.parse_args()
    args.model = args.model or unified_ckpt_path(args)
    resunet, variables = zoo.load_model("resunet", args.model,
                                        args.image_size)
    clean = ensure_clean_tree(args) if args.metrics else None
    infer.restore_tree(
        resunet.apply, variables,
        distorted_dir=args.distorted_dir, restored_dir=args.restored_dir,
        clean_dir=clean, batch_size=args.batch_size, size=args.image_size,
        has_batch_stats=True, compute_metrics=args.metrics,
        resize=args.resize)


if __name__ == "__main__":
    main()
