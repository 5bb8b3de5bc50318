"""Generate the motion-blur dataset (ref:03): degree=12 angle=45 kernel +
min-max renormalize, TPU-batched, into ./data/processed/Blur."""

from _common import PROCESSED, base_parser, ensure_clean_tree

from tsr_tpu import offline


def main():
    p = base_parser(__doc__)
    p.add_argument("--dst", default=f"{PROCESSED}/Blur")
    args = p.parse_args()
    offline.generate_tree(ensure_clean_tree(args), args.dst, "blur",
                          seed=args.seed)


if __name__ == "__main__":
    main()
