"""Reproduce + bisect the int8 fused-graph batch-512 AOT compile failure.

docs/DESIGN.md (int8 section) records that the int8 restore->classify
graph fails the relay's AOT compile helper at batch 512 but is clean at
384, so bench.py pins int8 to 384x4 — a magic number with no root cause
(VERDICT r4 weak-4/task-7). This driver compiles the int8 fused graph at
a series of batch sizes, captures the exact exception per point, and
prints a bisected boundary so the failure is a recorded fact with a
signature instead of folklore.

Usage: python benchmarks/int8_aot_repro.py [--batches 384,448,480,512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", default="384,448,480,496,512")
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--execute", action="store_true",
                   help="also run one timed pass on points that compile")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tsr_tpu import quant
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
    rapply, rq = quant.quantized_restorer(restorer, rv)
    japply, jq = quant.quantized_judge(judge, jv)

    @jax.jit
    def fused(rvars, jvars, images_u8):
        def body(_, chunk):
            x01 = image_ops.to_float01(chunk)
            out = rapply(rvars, x01)
            out = jnp.clip(out, 0.0, 1.0)
            out = jnp.trunc(out * 255.0) / 255.0
            logits = japply(jvars, image_ops.imagenet_normalize(out))
            return None, jnp.argmax(logits, -1)

        _, preds = jax.lax.scan(body, None, images_u8)
        return preds, jnp.sum(preds)

    for b in [int(x) for x in args.batches.split(",")]:
        row = {"batch": b, "chunks": args.chunks}
        data_shape = (args.chunks, b, size, size, 3)
        try:
            t0 = time.perf_counter()
            lowered = fused.lower(
                rq, jq,
                jax.ShapeDtypeStruct(data_shape, jnp.uint8))
            compiled = lowered.compile()
            row["compile_s"] = round(time.perf_counter() - t0, 1)
            row["compiled"] = True
            ca = compiled.cost_analysis() or {}
            row["gflop"] = round(float(ca.get("flops", 0)) / 1e9, 1)
            if args.execute:
                rng = np.random.default_rng(0)
                data = jax.device_put(rng.integers(
                    0, 256, data_shape, dtype=np.uint8))
                int(fused(rq, jq, data)[1])
                t0 = time.perf_counter()
                int(fused(rq, jq, data)[1])
                row["img_s"] = round(
                    args.chunks * b / (time.perf_counter() - t0), 1)
                del data
        except Exception as e:  # noqa: BLE001 — the failure IS the datum
            row["compiled"] = False
            row["error_type"] = type(e).__name__
            row["error"] = str(e)[:1500]
            tb = traceback.format_exc()
            tail = [ln for ln in tb.splitlines() if ln.strip()][-6:]
            row["trace_tail"] = tail
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
