"""Generate the fog dataset (ref:04): I = J*t + A*(1-t), intensity 0.8,
per-image t jitter, TPU-batched, into ./data/processed/Fog."""

from _common import PROCESSED, base_parser, ensure_clean_tree

from tsr_tpu import offline


def main():
    p = base_parser(__doc__)
    p.add_argument("--dst", default=f"{PROCESSED}/Fog")
    p.add_argument("--strength-jitter", action="store_true",
                   help="draw intensity per image from U[0.05,0.85] "
                        "(t = 1 - i) instead of the fixed 0.8 — covers the "
                        "mild cascade point t=0.9 (ref:13:51) the fixed "
                        "tree never shows the restorer")
    args = p.parse_args()
    kind = "fog_rand" if args.strength_jitter else "fog"
    offline.generate_tree(ensure_clean_tree(args), args.dst, kind,
                          seed=args.seed)


if __name__ == "__main__":
    main()
