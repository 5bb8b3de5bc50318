"""Fetch the GTSRB training split (ref:01:5-18), or build a synthetic tree
with --synthetic in air-gapped environments."""

from _common import base_parser, ensure_clean_tree


def main():
    args = base_parser(__doc__).parse_args()
    if args.synthetic:
        path = ensure_clean_tree(args)
    else:
        from tsr_tpu.data import gtsrb

        path = gtsrb.download_gtsrb("./data")
    print(f"Data ready at: {path}")


if __name__ == "__main__":
    main()
