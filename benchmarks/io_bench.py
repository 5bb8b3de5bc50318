"""Host IO-tier microbenchmark: native (tsrio.cpp) vs cv2 decode+resize.

The eval harness streams directory trees through _decode_resize_batch
(tsr_tpu/data/gtsrb.py); GTSRB is .ppm but every distorted/restored tree
is .png (ref:16:55, ref:09:15-26), so PNG decode sits on the hot path of
scripts 09/18 (non-fused), 11, 12 and restore_tree. Measures images/sec
of both backends on a synthetic PNG + PPM tree at representative native
sizes, plus the threaded PNG encode path.

Usage: python benchmarks/io_bench.py [--n 512] [--threads 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsr_tpu import native  # noqa: E402
from tsr_tpu.data import synthetic  # noqa: E402


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--size", type=int, default=224,
                   help="resize target (model input)")
    p.add_argument("--threads", type=int, default=8)
    args = p.parse_args()

    import cv2

    assert native.available(), "libtsrio failed to build"
    out = {}
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        # a GTSRB-like spread of native sizes, written as PNG (cv2 encoder,
        # i.e. libpng's filter heuristics — the adversarial decode case)
        tree = root / "tree"
        synthetic.write_image_tree(str(tree), num_classes=8,
                                   per_class=(args.n + 7) // 8, size=72,
                                   seed=0, size_jitter=0.45)
        ppm_paths = [str(q) for q in sorted(tree.glob("*/*.ppm"))][:args.n]
        png_paths = []
        png_dir = root / "png"
        png_dir.mkdir()
        for i, q in enumerate(ppm_paths):
            img = cv2.imread(q)
            dst = str(png_dir / f"{i}.png")
            cv2.imwrite(dst, img)
            png_paths.append(dst)

        def cv2_batch(paths):
            return np.stack([
                cv2.resize(cv2.imread(q), (args.size, args.size),
                           interpolation=cv2.INTER_LINEAR)[:, :, ::-1]
                for q in paths])

        for name, paths in (("ppm", ppm_paths), ("png", png_paths)):
            nat = timeit(lambda: native.load_batch(paths, args.size,
                                                   threads=args.threads))
            ref = timeit(lambda: cv2_batch(paths))
            out[f"{name}_native_img_s"] = round(len(paths) / nat, 1)
            out[f"{name}_cv2_img_s"] = round(len(paths) / ref, 1)
            out[f"{name}_speedup"] = round(ref / nat, 2)

        # encode path (restored-tree writes, ref:08:100-109)
        imgs = np.ascontiguousarray(np.stack([
            cv2.resize(cv2.imread(q)[:, :, ::-1], (args.size, args.size))
            for q in png_paths[:64]]))
        enc_dir = root / "enc"
        enc_dir.mkdir()
        enc_paths = [str(enc_dir / f"e{i}.png") for i in range(len(imgs))]
        nat = timeit(lambda: native.write_png_batch(enc_paths, imgs,
                                                    threads=args.threads))
        ref = timeit(lambda: [cv2.imwrite(q, imgs[i][:, :, ::-1])
                              for i, q in enumerate(enc_paths)])
        out["encode_native_img_s"] = round(len(imgs) / nat, 1)
        out["encode_cv2_img_s"] = round(len(imgs) / ref, 1)
        out["encode_speedup"] = round(ref / nat, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
