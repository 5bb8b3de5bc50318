"""Headline benchmark: fused restore→classify images/sec on one TPU chip.

Measures the BASELINE.json north-star path — uint8 batch -> ResUNet
restoration -> PNG-quantization -> ImageNet-normalize -> VGG16 judge ->
top-1 — as a single jitted graph (lax.scan over chunks, one dispatch per
timed super-batch, data resident on device), in bfloat16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` divides by the torch CPU reference pipeline measured by
benchmarks/torch_cpu_baseline.py (reference runs batch-restore ref:17:73-99
then judge eval ref:06:49-55 at 224x224).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tsr_tpu.models import ResUNet, VGG16
    from tsr_tpu.ops import image as image_ops
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()

    size = int(os.environ.get("TSR_BENCH_SIZE", "224"))
    batch = int(os.environ.get("TSR_BENCH_BATCH", "256"))
    chunks = int(os.environ.get("TSR_BENCH_CHUNKS", "4"))
    reps = int(os.environ.get("TSR_BENCH_REPS", "3"))
    dtype = jnp.bfloat16

    restorer = ResUNet(dtype=dtype)
    judge = VGG16(num_classes=43, dtype=dtype)
    k = jax.random.PRNGKey(0)
    rv = restorer.init(k, jnp.zeros((1, size, size, 3), jnp.float32),
                       train=False)
    jv = judge.init(k, jnp.zeros((1, size, size, 3), jnp.float32))

    @jax.jit
    def fused(rvars, jvars, images_u8):
        """[K, B, H, W, 3] uint8 -> per-image predictions [K, B]."""

        def body(_, chunk):
            x01 = image_ops.to_float01(chunk)
            out = restorer.apply(rvars, x01, train=False)
            out = jnp.clip(out, 0.0, 1.0)
            out = jnp.trunc(out * 255.0) / 255.0  # PNG round-trip parity
            logits = judge.apply(jvars, image_ops.imagenet_normalize(out))
            return None, jnp.argmax(logits, -1)

        _, preds = jax.lax.scan(body, None, images_u8)
        # tiny scalar output: forces real execution on backends where
        # block_until_ready on large buffers is async (axon relay)
        return preds, jnp.sum(preds)

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (chunks, batch, size, size, 3),
                        dtype=np.uint8)
    data = jax.device_put(data)

    # warmup / compile; int() forces a device->host read, which is the only
    # reliable completion barrier through the axon relay
    int(fused(rv, jv, data)[1])

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(fused(rv, jv, data)[1])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ips = chunks * batch / dt

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "cpu_baseline.json")
    vs = float("nan")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        vs = ips / ref["images_per_sec"]

    print(json.dumps({
        "metric": "fused restore(ResUNet)->classify(VGG16) throughput, "
                  f"{size}x{size} bf16, single chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
