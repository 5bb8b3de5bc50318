"""Unified single-image demo (ref:15): compound distort (Fog->Noise->Blur),
blind ResUNet restore, VGG confidence on clean/bad/restored, 1x3 figure."""

import random
from pathlib import Path

import jax
import numpy as np

from _common import (base_parser, ensure_clean_tree, judge_ckpt_path,
                     unified_ckpt_path)

from tsr_tpu import pipeline, viz, zoo
from tsr_tpu.data import gtsrb


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default=None)
    p.add_argument("--unified", default=None)
    p.add_argument("--sample", default=None,
                   help="relative path of the sample inside the clean tree (the reference hardcodes its demo sample, ref:15:20)")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--out", default="unified_test_result.png")
    args = p.parse_args()
    args.model = args.model or judge_ckpt_path(args)
    args.unified = args.unified or unified_ckpt_path(args)
    clean_root = Path(ensure_clean_tree(args))

    ncls = args.num_classes or len(gtsrb.ImageFolder(clean_root).classes)
    judge, jv = zoo.load_model("vgg16", args.model, args.image_size,
                               num_classes=ncls)
    resunet, rv = zoo.load_model("resunet", args.unified, args.image_size)

    files = sorted(f for f in clean_root.glob("*/*")
                   if f.suffix.lower() in gtsrb.IMG_EXTENSIONS)
    if args.sample:
        pick = clean_root / args.sample
        assert pick.exists(), pick
    else:
        random.seed(args.seed)
        pick = random.choice(files)
    print(f"Sample: {pick.relative_to(clean_root)}")
    clean = gtsrb._decode_resize(str(pick), args.image_size)[None]

    # compound distortion applies at native resolution (ref:15:170-174
    # distorts the raw cv2 image; only the tensor path resizes to 224)
    import cv2

    from tsr_tpu.ops import distortions

    native = np.ascontiguousarray(cv2.imread(str(pick))[:, :, ::-1])
    bad_native = np.asarray(distortions.make_compound_distortion(
        native, jax.random.PRNGKey(args.seed)))
    bad = cv2.resize(bad_native, (args.image_size, args.image_size),
                     interpolation=cv2.INTER_LINEAR)[None]

    out = pipeline.unified_demo(clean, resunet.apply, rv, judge.apply, jv,
                                jax.random.PRNGKey(args.seed), bad_u8=bad)
    j = out["judge"]
    caps = [
        f"Clean — pred {int(j['clean']['pred'][0])} "
        f"({float(j['clean']['confidence'][0]):.2f})",
        f"Compound Distorted — pred {int(j['bad']['pred'][0])} "
        f"({float(j['bad']['confidence'][0]):.2f})",
        f"Unified Restored — pred {int(j['restored']['pred'][0])} "
        f"({float(j['restored']['confidence'][0]):.2f})",
    ]
    viz.demo_figure(clean[0], out["bad_u8"][0], out["restored_u8"][0],
                    caps, args.out)
    for c in caps:
        print(c)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()
