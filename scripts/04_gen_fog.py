"""Generate the fog dataset (ref:04): I = J*t + A*(1-t), intensity 0.8,
per-image t jitter, TPU-batched, into ./data/processed/Fog."""

from _common import PROCESSED, base_parser, ensure_clean_tree

from tsr_tpu import offline


def main():
    p = base_parser(__doc__)
    p.add_argument("--dst", default=f"{PROCESSED}/Fog")
    args = p.parse_args()
    offline.generate_tree(ensure_clean_tree(args), args.dst, "fog",
                          seed=args.seed)


if __name__ == "__main__":
    main()
