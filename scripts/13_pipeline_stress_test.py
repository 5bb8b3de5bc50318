"""Cascade stress test (ref:13): N random clean images, step-by-step
Blur->Fog->Noise distortion (mild params), chained Noise->Fog->Blur
restoration through the three specialized U-Nets (raw tensor between
stages), VGG confidence at all 7 stages, per-image 2x4 figure + mean
confidence report."""

import random
from pathlib import Path

import jax
import numpy as np

from _common import (base_parser, ensure_clean_tree, judge_ckpt_path,
                     restorer_ckpt_path)

from tsr_tpu import pipeline, viz, zoo
from tsr_tpu.data import gtsrb


def main():
    p = base_parser(__doc__)
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--model", default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--out-dir", default="pipeline_results")
    args = p.parse_args()
    args.model = args.model or judge_ckpt_path(args)
    clean_root = Path(ensure_clean_tree(args))

    ncls = args.num_classes or len(gtsrb.ImageFolder(clean_root).classes)
    judge, jv = zoo.load_model("vgg16", args.model, args.image_size,
                               num_classes=ncls)
    # per-task modules: each checkpoint's config may change the
    # architecture (e.g. the fog restorer's input_minmax stretch)
    restorer_apply, restorer_vars, task_cfgs = {}, {}, {}
    for task in ("noise", "fog", "blur"):
        path = restorer_ckpt_path(task, args)
        m, v = zoo.load_model("simple_unet", path, args.image_size)
        restorer_apply[task] = m.apply
        restorer_vars[task] = v
        task_cfgs[task] = zoo.checkpoint_config(path)
    variant, variant_desc = pipeline.cascade_variant(task_cfgs)

    files = sorted(f for f in clean_root.glob("*/*")
                   if f.suffix.lower() in gtsrb.IMG_EXTENSIONS)
    random.seed(args.seed)
    picks = random.sample(files, min(args.num_samples, len(files)))

    # Phase-1 distortions apply at NATIVE resolution (ref:13:147-169 works
    # on the raw cv2 image; only the restoration tensor path resizes to
    # 224, ref:13:176) — then every stage is resized for the 224 batch.
    import cv2

    from tsr_tpu import configs
    from tsr_tpu.ops import distortions

    mild = configs.MildConfig()
    key = jax.random.PRNGKey(args.seed)
    stage_imgs = {name: [] for name in
                  ("Clean", "+ Blur", "+ Fog", "+ Noise (final bad)")}
    for f in picks:
        native = cv2.imread(str(f))[:, :, ::-1]
        key, kn = jax.random.split(key)
        x = np.ascontiguousarray(native)
        blur = np.asarray(distortions.mild_blur(x, mild))
        fog = np.asarray(distortions.mild_fog(blur, mild))
        noise = np.asarray(distortions.mild_noise(fog, kn, mild))
        for name, img in (("Clean", x), ("+ Blur", blur), ("+ Fog", fog),
                          ("+ Noise (final bad)", noise)):
            stage_imgs[name].append(cv2.resize(
                img, (args.image_size, args.image_size),
                interpolation=cv2.INTER_LINEAR))
    stages = [(name, np.stack(imgs)) for name, imgs in stage_imgs.items()]
    batch = stages[0][1]

    out = pipeline.cascade_stress(
        batch, restorer_apply, restorer_vars, judge.apply, jv,
        jax.random.PRNGKey(args.seed), precomputed_stages=stages)

    outdir = Path(args.out_dir)
    outdir.mkdir(exist_ok=True)
    for i in range(len(batch)):
        stages = [(name, imgs[i]) for name, imgs in out["stages"]]
        annot = [f"pred {int(out['preds'][k][i])} "
                 f"conf {float(out['confidences'][k][i]):.2f}"
                 for k in range(len(stages))]
        viz.cascade_figure(
            stages, annot, str(outdir / f"pipeline_sample_{i + 1}.png"),
            caption=f"cascade restorer variant {variant}: {variant_desc}")

    mc = out["mean_confidence"]
    print("=" * 40)
    print("Mean confidence report")
    print("=" * 40)
    print(f"Clean:     {mc['clean']:.4f}")
    print(f"Distorted: {mc['distorted']:.4f}")
    print(f"Restored:  {mc['restored']:.4f}")
    print(f"Restorer variant: {variant} ({variant_desc})")
    print("Measured net-confidence delta by variant "
          "(RESULTS.md cascade section; ref:13 = +0.103): "
          + ", ".join(f"{k} {d:+.3f}"
                      for k, (_, d) in pipeline.VARIANT_TABLE.items()))
    print(f"Figures in {outdir}/")


if __name__ == "__main__":
    main()
