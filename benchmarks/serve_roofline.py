"""Serving-path roofline: FLOP/byte analysis + super-batch grid for the
fused restore(ResUNet)->classify(VGG16) graph (the bench.py headline).

VERDICT r4 weak-2: training got a measured cost_analysis roofline
(RESULTS.md), the 1504 img/s serving headline never did — so there was no
way to say whether 1504 is the ceiling or sloth. This driver:

1. compiles the exact bench.py fused graph (uint8 -> restore -> PNG
   quantization -> imagenet-normalize -> judge -> argmax, lax.scan over
   chunks) and reads XLA ``cost_analysis`` (flops, bytes accessed),
2. times it across a (batch x chunks) grid EXTENDING past the round-4
   512x8 optimum (ROADMAP named the larger super-batches as untested
   HBM headroom), recording OOMs as grid facts,
3. prints per-point arithmetic intensity and % of bf16 peak, plus a
   summary naming the binding resource.

v5e-1 peaks used (same constants as the training roofline): 197 TFLOP/s
bf16, 819 GB/s HBM -> ridge point ~241 flop/byte.

Usage: python benchmarks/serve_roofline.py [--grid ...] [--reps 3]
Ref: the loops this graph replaces, ref:18:35-53 + ref:17:73-99.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BF16 = 197e12  # TFLOP/s, v5e-1
HBM_BPS = 819e9     # B/s


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grid", default="256x8,512x8,512x16,640x8,768x8,"
                                     "768x16,1024x4,1024x8")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tsr_tpu.models import ResUNet, VGG16
    from tsr_tpu.ops import image as image_ops
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()
    size = args.size
    dtype = jnp.bfloat16

    restorer = ResUNet(dtype=dtype)
    judge = VGG16(num_classes=43, dtype=dtype)
    k = jax.random.PRNGKey(0)
    rv = restorer.init(k, jnp.zeros((1, size, size, 3), jnp.float32),
                       train=False)
    jv = judge.init(k, jnp.zeros((1, size, size, 3), jnp.float32))

    @jax.jit
    def fused(rvars, jvars, images_u8):
        def body(_, chunk):
            x01 = image_ops.to_float01(chunk)
            out = restorer.apply(rvars, x01, train=False)
            out = jnp.clip(out, 0.0, 1.0)
            out = jnp.trunc(out * 255.0) / 255.0
            logits = judge.apply(jvars, image_ops.imagenet_normalize(out))
            return None, jnp.argmax(logits, -1)

        _, preds = jax.lax.scan(body, None, images_u8)
        return preds, jnp.sum(preds)

    rows = []
    for spec in args.grid.split(","):
        batch, chunks = (int(x) for x in spec.strip().split("x"))
        n = batch * chunks
        row = {"batch": batch, "chunks": chunks, "images": n}
        try:
            rng = np.random.default_rng(0)
            data = jax.device_put(rng.integers(
                0, 256, (chunks, batch, size, size, 3), dtype=np.uint8))
            lowered = fused.lower(rv, jv, data)
            compiled = lowered.compile()
            ca = compiled.cost_analysis() or {}
            # XLA cost_analysis counts a while/scan BODY ONCE, not times
            # the trip count (verified: reported flops are invariant in
            # `chunks`), so the module's flops ~= one chunk's worth and
            # per-image = flops / batch, total executed = flops * chunks.
            flops1 = float(ca.get("flops", float("nan")))
            bytes1 = float(ca.get("bytes accessed", float("nan")))
            flops = flops1 * chunks
            bytes_acc = bytes1 * chunks

            int(fused(rv, jv, data)[1])  # warmup (real execution barrier)
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                int(fused(rv, jv, data)[1])
                times.append(time.perf_counter() - t0)
            dt = min(times)
            row.update({
                "img_s": round(n / dt, 1),
                "ms": round(dt * 1e3, 1),
                "gflop_per_img": round(flops / n / 1e9, 2),
                "ai_flop_per_byte": round(flops / bytes_acc, 1),
                "pct_bf16_peak": round(flops / dt / PEAK_BF16 * 100, 1),
                "mxu_ideal_ms": round(flops / PEAK_BF16 * 1e3, 1),
                "hbm_ideal_ms": round(bytes_acc / HBM_BPS * 1e3, 1),
            })
            del data
        except Exception as e:  # noqa: BLE001 — OOM is a grid datum
            msg = str(e)
            row["error"] = ("OOM" if "RESOURCE_EXHAUSTED" in msg
                            or "Out of memory" in msg else msg[:300])
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if "img_s" in r]
    if ok:
        best = max(ok, key=lambda r: r["img_s"])
        bound = ("HBM" if best["hbm_ideal_ms"] > best["mxu_ideal_ms"]
                 else "MXU")
        print(json.dumps({"summary": {
            "best": best,
            "ridge_flop_per_byte": round(PEAK_BF16 / HBM_BPS, 0),
            "compiler_bound_resource": bound,
            "note": "pct_bf16_peak vs the binding ideal says ceiling-vs-"
                    "sloth; OOM rows mark the HBM grid edge"}}),
            flush=True)


if __name__ == "__main__":
    main()
