"""Per-template-group accuracy breakdown for a calibration band.

The compound band of the synthetic stand-in has a *structural* floor: even
if the compound chain (Blur->Fog->Noise, ref:16:22-35) destroys all digit
information, a judge that still reads the sign *template* (speed ring /
warning triangle / blue disc / unique shape) scores the uniform-over-group
baseline — (13/43)/13 + (17/43)/17 + (9/43)/9 + unique-survival ≈ 14%,
above the reference's 5.78% (reference README.md:109). Getting under 10%
therefore requires a subpopulation (small + dark natives) where even the
template dies. This tool measures exactly that: top-1 accuracy per
template group on any distorted tree from calibrate_standin.py, so a band
miss can be attributed to the surviving subpopulation instead of guessed.

Usage (after a calibrate_standin.py run left its work dir):
    python benchmarks/band_diag.py --work /tmp/tsr_cI --tree compound
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsr_tpu import zoo  # noqa: E402
from tsr_tpu.data import gtsrb  # noqa: E402
from tsr_tpu.data.synthetic import _class_spec  # noqa: E402
from tsr_tpu.ops import image as image_ops  # noqa: E402


def group_accuracy(judge_apply, judge_vars, tree: Path, size: int = 224,
                   batch: int = 128) -> dict:
    """-> {kind: {"classes": n, "mean_acc": float, "per_class": [...]}}."""
    import jax
    import jax.numpy as jnp

    ds = gtsrb.ImageFolder(str(tree), size=size)
    imgs, labels = ds.load_batch(range(len(ds)))
    labels = np.asarray(labels)

    @jax.jit
    def pred(v, x):
        logits = judge_apply(v, image_ops.imagenet_normalize(
            image_ops.to_float01(x)), train=False)
        return jnp.argmax(logits, -1)

    judge_vars = jax.device_put(judge_vars)
    preds = []
    for i in range(0, len(imgs), batch):
        chunk = imgs[i:i + batch]
        if len(chunk) < batch:  # pad the tail to keep one compiled shape
            pad = np.zeros((batch - len(chunk),) + imgs.shape[1:],
                           imgs.dtype)
            preds.append(np.asarray(
                pred(judge_vars, np.concatenate([chunk, pad])))[:len(chunk)])
        else:
            preds.append(np.asarray(pred(judge_vars, chunk)))
    preds = np.concatenate(preds)

    ncls = len(ds.classes)
    out: dict = {}
    for cid in range(ncls):
        kind, _ = _class_spec(cid)
        m = labels == cid
        acc = float((preds[m] == cid).mean()) if m.any() else float("nan")
        g = out.setdefault(kind, {"classes": 0, "per_class": []})
        g["classes"] += 1
        g["per_class"].append(acc)
    for g in out.values():
        g["mean_acc"] = float(np.mean(g["per_class"]))
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", required=True,
                   help="calibrate_standin.py work dir (holds judge/ and "
                        "the distorted trees)")
    p.add_argument("--tree", default="compound",
                   choices=["clean", "noise", "blur", "fog", "compound"])
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batchnorm", action="store_true")
    args = p.parse_args()

    work = Path(args.work)
    ds = gtsrb.ImageFolder(str(work / args.tree), size=args.image_size)
    judge, jv = zoo.load_model(
        "vgg16", str(work / "judge"), args.image_size,
        num_classes=len(ds.classes), use_batchnorm=args.batchnorm)
    groups = group_accuracy(judge.apply, jv, work / args.tree,
                            size=args.image_size)
    total = 0.0
    ncls = sum(g["classes"] for g in groups.values())
    for kind, g in sorted(groups.items()):
        total += g["mean_acc"] * g["classes"]
        cells = " ".join(f"{a * 100:3.0f}" for a in g["per_class"])
        print(f"{kind:7s} n={g['classes']:2d} mean {g['mean_acc'] * 100:5.1f}%"
              f"  [{cells}]")
    print(f"overall {total / ncls * 100:5.1f}%  ({args.tree})")


if __name__ == "__main__":
    main()
