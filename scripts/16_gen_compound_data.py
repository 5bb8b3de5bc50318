"""Generate the compound dataset (ref:16): Blur(10,45) -> Fog(0.5) ->
Noise(0.02), saved as .png, into ./data/processed/Compound."""

from _common import PROCESSED, base_parser, ensure_clean_tree

from tsr_tpu import offline


def main():
    p = base_parser(__doc__)
    p.add_argument("--dst", default=f"{PROCESSED}/Compound")
    args = p.parse_args()
    offline.generate_tree(ensure_clean_tree(args), args.dst, "compound",
                          seed=args.seed)


if __name__ == "__main__":
    main()
