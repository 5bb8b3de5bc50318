"""3x3 clean/distorted/restored comparison grid (ref:10), saved to
result_visualization.png."""

import random
from pathlib import Path

from _common import PROCESSED, RESTORED, base_parser, ensure_clean_tree

from tsr_tpu import viz
from tsr_tpu.data import gtsrb


def main():
    p = base_parser(__doc__)
    p.add_argument("--out", default="result_visualization.png")
    args = p.parse_args()
    clean_root = Path(ensure_clean_tree(args))

    files = sorted(clean_root.glob("*/*"))
    files = [f for f in files if f.suffix.lower() in gtsrb.IMG_EXTENSIONS]
    random.seed(args.seed)
    target = random.choice(files)
    rel = target.relative_to(clean_root)
    print(f"Visualizing: {rel}")

    def read(p):
        import cv2

        img = cv2.imread(str(p))
        return img[:, :, ::-1] if img is not None else None

    clean = read(target)
    distorted, restored = {}, {}
    for task in ("Noise", "Blur", "Fog"):
        bad = Path(PROCESSED) / task / rel
        if not bad.exists():
            bad = bad.with_suffix(".png")
        res = (Path(RESTORED) / task / rel).with_suffix(".png")
        if bad.exists():
            distorted[task] = read(bad)
        if res.exists():
            restored[task] = read(res)
    viz.comparison_grid(clean, distorted, restored, args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()
