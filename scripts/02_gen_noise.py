"""Generate the AWGN dataset (ref:02): sigma^2=0.02 noise at native
resolution, TPU-batched, into ./data/processed/Noise."""

from _common import PROCESSED, base_parser, ensure_clean_tree

from tsr_tpu import offline


def main():
    p = base_parser(__doc__)
    p.add_argument("--dst", default=f"{PROCESSED}/Noise")
    args = p.parse_args()
    offline.generate_tree(ensure_clean_tree(args), args.dst, "noise",
                          seed=args.seed)


if __name__ == "__main__":
    main()
