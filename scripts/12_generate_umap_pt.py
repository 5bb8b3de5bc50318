"""GAP embeddings over 7 modes + 2-D projection export (ref:12).

Samples N same-named images per mode, extracts VGG features.30 -> GAP 512-d
vectors, projects to 2-D with the in-house UMAP (tsr_tpu.umap_lite; reference
parameters, ref:12:131-139), and saves the reference-schema dict
{embeddings, labels, original_features} to umap_embeddings.pt plus a
scatter figure."""

import random
from pathlib import Path

import numpy as np

from _common import (PROCESSED, RESTORED, base_parser, ensure_clean_tree,
                     judge_ckpt_path)

from tsr_tpu import interpret, viz, zoo
from tsr_tpu.data import gtsrb
from tsr_tpu.models.vgg import GAP_TAP


def main():
    p = base_parser(__doc__)
    p.add_argument("--model", default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--samples-per-mode", type=int, default=100)
    p.add_argument("--method", default="umap",
                   choices=["umap", "tsne", "pca"])
    p.add_argument("--out-pt", default="umap_embeddings.pt")
    p.add_argument("--out-img", default="umap_visualization.png")
    args = p.parse_args()
    args.model = args.model or judge_ckpt_path(args)
    clean_root = Path(ensure_clean_tree(args))

    ncls = args.num_classes or len(gtsrb.ImageFolder(clean_root).classes)
    judge, jv = zoo.load_model("vgg16", args.model, args.image_size,
                               num_classes=ncls)

    modes = {
        "Clean": clean_root,
        "Noise (Bad)": Path(PROCESSED) / "Noise",
        "Noise (Restored)": Path(RESTORED) / "Noise",
        "Blur (Bad)": Path(PROCESSED) / "Blur",
        "Blur (Restored)": Path(RESTORED) / "Blur",
        "Fog (Bad)": Path(PROCESSED) / "Fog",
        "Fog (Restored)": Path(RESTORED) / "Fog",
    }

    files = sorted(f for f in clean_root.glob("*/*")
                   if f.suffix.lower() in gtsrb.IMG_EXTENSIONS)
    random.seed(42)  # ref:12 fixes seeds
    if len(files) > args.samples_per_mode:
        files = random.sample(files, args.samples_per_mode)

    mode_batches = {}
    for mode, root in modes.items():
        imgs = []
        for f in files:
            rel = f.relative_to(clean_root)
            target = f if mode == "Clean" else root / rel
            if not target.exists():
                target = target.with_suffix(".png")
            if target.exists():
                imgs.append(gtsrb._decode_resize(str(target),
                                                 args.image_size))
        if imgs:
            mode_batches[mode] = np.stack(imgs)
        else:
            print(f"Skipping mode '{mode}': no files")

    feats = interpret.collect_mode_embeddings(
        judge.apply, jv, mode_batches,
        tap_layer=judge.tap_index(GAP_TAP))
    all_feats = np.concatenate([feats[m] for m in mode_batches])
    all_labels = sum(([m] * len(feats[m]) for m in mode_batches), [])
    print(f"Features: {all_feats.shape}")

    emb = interpret.project_2d(all_feats, method=args.method, seed=42)
    interpret.export_embeddings_pt(args.out_pt, emb, all_labels, all_feats)
    viz.embedding_scatter(emb, all_labels, args.out_img)
    print(f"Saved {args.out_pt} and {args.out_img}")


if __name__ == "__main__":
    main()
