"""Restore the specialized task trees and report PSNR/SSIM (ref:08) —
batched on TPU instead of the reference's per-image batch-1 loop."""

from _common import (PROCESSED, RESTORED, base_parser, ensure_clean_tree,
                     restorer_ckpt_path)

from tsr_tpu import infer, zoo


def main():
    p = base_parser(__doc__)
    p.add_argument("--tasks", nargs="+", default=["noise", "blur", "fog"])
    # Measured defaults (benchmarks/readings/r5/restore_ab_*.jsonl): the
    # tree walk is relay-bandwidth-bound, so SMALL batches win (finer
    # overlap) and the device-resize path (native-resolution upload) is
    # the big lever — see tsr_tpu/infer.py module docstring.
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--resize", default="device",
                   choices=["device", "host"],
                   help="resize natives on device (measured fastest; "
                        "<=1 LSB vs cv2) or on host (exact reference "
                        "semantics)")
    args = p.parse_args()
    clean = ensure_clean_tree(args)

    import os
    for task in args.tasks:
        model_path = restorer_ckpt_path(task, args)
        if not os.path.exists(model_path):
            print(f"Warning: model {model_path} not found, skipping {task}.")
            continue
        print(f"\n=== Task: {task} ===")
        unet, variables = zoo.load_model("simple_unet", model_path,
                                         args.image_size)
        infer.restore_tree(
            unet.apply, variables,
            distorted_dir=f"{PROCESSED}/{task.capitalize()}",
            restored_dir=f"{RESTORED}/{task.capitalize()}",
            clean_dir=clean, batch_size=args.batch_size,
            size=args.image_size, resize=args.resize)


if __name__ == "__main__":
    main()
