"""restore_tree batch-size A/B: end-to-end img/s vs --batch-size.

The demo measured the pipelined restore_tree (tsr_tpu/infer.py) at
65.8-98.3 img/s with the scripts' default batch 64, while the pure fused
compute path does ~1500 img/s — so the tree walk is host/relay-bound, not
TPU-bound. Each dispatched batch pays a fixed cost (device_put + dispatch
+ fetch over the axon relay's ~30 ms RTT, plus producer/writer handoff);
a larger batch amortizes it. This driver measures restore_tree end to end
(decode -> restore+PSNR/SSIM -> native PNG encode) over a freshly built
synthetic noise tree at several batch sizes so the scripts' default
(scripts/08_run_inference.py, 17_run_unified_inference.py) is a measured
choice rather than a habit. Weights are random init: throughput is
independent of weight values. Ref loops this replaces: ref:08:86-109
(batch-1), ref:17:73-99 (batch-32).

Usage: python benchmarks/restore_ab.py [--n 1200] [--batches 64,128,256]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1200, help="tree size (images)")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--batches", default="64,128,256,384")
    p.add_argument("--reps", type=int, default=2,
                   help="passes per batch size; best (warm-cache) pass "
                        "is reported")
    p.add_argument("--resize", default="device",
                   choices=["device", "host"],
                   help="restore_tree resize mode (see tsr_tpu.infer)")
    p.add_argument("--workdir", default=None,
                   help="keep trees here instead of a tempdir")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from tsr_tpu import infer
    from tsr_tpu.data import synthetic
    from tsr_tpu.models import SimpleUNet
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()

    ctx = (tempfile.TemporaryDirectory() if args.workdir is None else None)
    root = Path(ctx.name if ctx else args.workdir)
    clean = root / "clean"
    noisy = root / "noisy"
    classes = 8
    per_class = (args.n + classes - 1) // classes
    # Reuse guard (ADVICE r4): a --workdir from an interrupted run or a
    # different --n would silently benchmark a stale/partial tree. Image
    # counts are the ground truth (mirrors scripts/_common.ensure_clean_tree).
    want = classes * per_class
    if root.exists() and len(list(noisy.glob("*/*.png"))) != want:
        import shutil

        for d in (clean, noisy):
            shutil.rmtree(d, ignore_errors=True)
    if not (noisy / "00000").exists():
        synthetic.write_image_tree(
            str(clean), num_classes=classes, per_class=per_class,
            size=72, seed=0, size_jitter=0.45)
        # noise tree at native resolution, like scripts/02 (ref:02:12-27).
        # numpy AWGN, not ops.distortions: throughput is independent of
        # pixel values, and per-image jitted calls at jittered native
        # shapes would each trigger a fresh relay-side XLA compile.
        rng = np.random.default_rng(1)
        for q in sorted(clean.glob("*/*.ppm")):
            img = cv2.imread(str(q))[:, :, ::-1]
            x = img.astype(np.float32) / 255.0
            x = np.clip(x + rng.normal(0, 0.02 ** 0.5, img.shape), 0, 1)
            out = (x * 255.0).astype(np.uint8)
            dst = noisy / q.parent.name / (q.stem + ".png")
            dst.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(dst), np.asarray(out)[:, :, ::-1])

    model = SimpleUNet()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)))

    rows = []
    for bs in [int(b) for b in args.batches.split(",")]:
        best = None
        for _ in range(args.reps):
            with tempfile.TemporaryDirectory() as od:
                res = infer.restore_tree(
                    model.apply, variables, str(noisy), od,
                    clean_dir=str(clean), batch_size=bs, size=args.size,
                    resize=args.resize, log=lambda s: None)
            if best is None or res["images_per_sec"] > best["images_per_sec"]:
                best = res
        rows.append({"batch": bs, "resize": args.resize,
                     "img_s": best["images_per_sec"],
                     "images": best["images"]})
        print(json.dumps(rows[-1]), flush=True)

    top = max(rows, key=lambda r: r["img_s"])
    print(json.dumps({"winner_batch": top["batch"],
                      "winner_img_s": top["img_s"]}))
    if ctx:
        ctx.cleanup()


if __name__ == "__main__":
    main()
