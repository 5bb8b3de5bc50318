"""Generate the AWGN dataset (ref:02): sigma^2=0.02 noise at native
resolution, TPU-batched, into ./data/processed/Noise."""

from _common import PROCESSED, base_parser, ensure_clean_tree

from tsr_tpu import offline


def main():
    p = base_parser(__doc__)
    p.add_argument("--dst", default=f"{PROCESSED}/Noise")
    p.add_argument("--strength-jitter", action="store_true",
                   help="draw var per image from U[0.005,0.03] instead of "
                        "the fixed 0.02 (severity-robust restorer training; "
                        "ref:13 deploys severe-trained restorers on mild "
                        "inputs)")
    args = p.parse_args()
    kind = "noise_rand" if args.strength_jitter else "noise"
    offline.generate_tree(ensure_clean_tree(args), args.dst, kind,
                          seed=args.seed)


if __name__ == "__main__":
    main()
