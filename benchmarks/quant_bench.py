"""int8 serving-path benchmark: judge throughput bf16 vs int8 MXU.

Measures the two eval hot paths of the accuracy harnesses —

  * classify-only (ref:06:49-55 / 09 / 18 judge loop): uint8 batch ->
    normalize -> VGG16 -> top-1;
  * fused restore->classify (the bench.py north-star, ref:17:73-99 +
    ref:06): ResUNet (bf16) -> PNG-quantize -> normalize -> judge;

each with the fp (bf16) judge and with the int8-quantized judge
(tsr_tpu/quant.py: per-channel int8 weights, dynamic int8 activations,
int32 MXU accumulation — v5e's int8 peak is ~2x its bf16 peak). Same
scanned super-batch methodology as bench.py so numbers are comparable.

Prints one JSON line per (path, judge) cell plus a summary table.
Accuracy parity of the int8 path is gated by tests/test_quant.py; run
scripts 06/09/18 with --int8 for top-1 on real trees.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tsr_tpu import quant
    from tsr_tpu.models import ResUNet, VGG16
    from tsr_tpu.ops import image as image_ops
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()

    size = int(os.environ.get("TSR_BENCH_SIZE", "224"))
    batch = int(os.environ.get("TSR_BENCH_BATCH", "256"))
    chunks = int(os.environ.get("TSR_BENCH_CHUNKS", "4"))
    reps = int(os.environ.get("TSR_BENCH_REPS", "3"))

    judge = VGG16(num_classes=43, dtype=jnp.bfloat16)
    k = jax.random.PRNGKey(0)
    jv = judge.init(k, jnp.zeros((1, size, size, 3), jnp.float32))
    q_apply, qv = quant.quantized_judge(judge, jv)
    restorer = ResUNet(dtype=jnp.bfloat16)
    rv = restorer.init(k, jnp.zeros((1, size, size, 3), jnp.float32),
                       train=False)
    rq_apply, rqv = quant.quantized_restorer(restorer, rv)

    rng = np.random.default_rng(0)
    data = jax.device_put(rng.integers(
        0, 256, (chunks, batch, size, size, 3), dtype=np.uint8))

    def classify_path(japply):
        def body(_, chunk):
            x01 = image_ops.to_float01(chunk)
            logits = japply(image_ops.imagenet_normalize(x01))
            return None, jnp.argmax(logits, -1)
        return body

    def fused_path(japply, rapply=None):
        rapply = rapply or (lambda x: restorer.apply(rv, x, train=False))

        def body(_, chunk):
            x01 = image_ops.to_float01(chunk)
            out = rapply(x01)
            out = jnp.clip(out, 0.0, 1.0)
            out = jnp.trunc(out * 255.0) / 255.0  # PNG round-trip parity
            logits = japply(image_ops.imagenet_normalize(out))
            return None, jnp.argmax(logits, -1)
        return body

    def measure(body):
        @jax.jit
        def run(images_u8):
            _, preds = jax.lax.scan(body, None, images_u8)
            return jnp.sum(preds)  # scalar: real completion barrier

        int(run(data))  # compile + warmup
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(run(data))
            times.append(time.perf_counter() - t0)
        return chunks * batch / min(times)

    judge_fp = lambda x: judge.apply(jv, x, train=False)   # noqa: E731
    judge_q = lambda x: q_apply(qv, x)                     # noqa: E731
    rest_q = lambda x: rq_apply(rqv, x)                    # noqa: E731
    runs = (
        ("classify bf16", classify_path(judge_fp)),
        ("classify int8-judge", classify_path(judge_q)),
        ("fused bf16", fused_path(judge_fp)),
        ("fused int8-judge", fused_path(judge_q)),
        ("fused int8-full", fused_path(judge_q, rest_q)),
    )
    cells = {}
    for name, body in runs:
        ips = measure(body)
        cells[name] = ips
        print(json.dumps({
            "metric": f"{name} eval throughput, {size}x{size}, "
                      f"batch {batch}x{chunks}",
            "value": round(ips, 1), "unit": "images/sec/chip"}))

    print("\n| config | img/s | vs bf16 |")
    print("|---|---|---|")
    for p in ("classify", "fused"):
        base = cells[f"{p} bf16"]
        for name, ips in cells.items():
            if name.startswith(p):
                print(f"| {name} | {ips:.1f} | {ips / base:.2f}x |")


if __name__ == "__main__":
    main()
