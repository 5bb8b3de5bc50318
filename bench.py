"""Headline benchmark: fused restore→classify images/sec on one TPU chip.

Measures the BASELINE.json north-star path — uint8 batch -> ResUNet
restoration -> PNG-quantization -> ImageNet-normalize -> VGG16 judge ->
top-1 — as a single jitted graph (lax.scan over chunks, one dispatch per
timed super-batch, data resident on device), in bfloat16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "training": {"judge_train_img_s": N, "unified_train_img_s": N}}

``vs_baseline`` divides by the torch CPU reference pipeline measured by
benchmarks/torch_cpu_baseline.py (reference runs batch-restore ref:17:73-99
then judge eval ref:06:49-55 at 224x224). The ``training`` block tracks the
two training-path throughputs (device-resident judge epoch step,
ref:05:75-87 equivalent; unified distort+L1+perceptual+AdamW step,
ref:14:232-246 equivalent) so training-perf wins/regressions are captured
round over round (VERDICT r2 task 7). Set TSR_BENCH_TRAIN=0 to skip them.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _wait_for_backend(attempts=3, wait_s=600):
    """Bounded retry for the axon TPU relay (VERDICT r3 weak-1).

    The relay dies for 1h+ stretches; round 3's driver bench capture hit
    one and recorded rc=1 instead of a number. Probe the backend in a
    killable subprocess (an in-process hang can't be retried) and back off
    between attempts. Returns silently after the last attempt either way —
    the real run then produces the authoritative error if still down.
    """
    attempts = int(os.environ.get("TSR_BENCH_RETRIES", str(attempts)))
    wait_s = float(os.environ.get("TSR_BENCH_RETRY_WAIT", str(wait_s)))
    probe = "import jax; jax.devices()"
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=180)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            print(f"[bench] TPU backend unavailable (attempt {i + 1}/"
                  f"{attempts}); retrying in {wait_s:.0f}s", file=sys.stderr)
            time.sleep(wait_s)


def main():
    from tsr_tpu.utils import profiling

    _wait_for_backend()
    profiling.enable_compilation_cache()

    size = int(os.environ.get("TSR_BENCH_SIZE", "224"))
    ips = _fused_eval_throughput(size)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "cpu_baseline.json")
    vs = float("nan")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        vs = ips / ref["images_per_sec"]

    out = {
        "metric": "fused restore(ResUNet)->classify(VGG16) throughput, "
                  f"{size}x{size} bf16, single chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2),
    }
    if os.environ.get("TSR_BENCH_INT8", "1") != "0":
        # serving-path extension: same fused graph with the int8-quantized
        # restorer+judge (tsr_tpu/quant.py; full table in
        # benchmarks/quant_bench.py). Never let it cost the headline
        # number: a failure here degrades to omitting the key.
        try:
            out["int8_fused_img_s"] = round(_fused_eval_throughput(
                size, int8=True), 1)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] int8 block failed: {e!r}", file=sys.stderr)
    if os.environ.get("TSR_BENCH_TRAIN", "1") != "0":
        # eval-path device buffers were dropped when _fused_eval_throughput
        # returned; the training block gets a near-empty HBM.
        out["training"] = _training_throughputs(size)
    print(json.dumps(out))


def _fused_eval_throughput(size, int8=False):
    import jax
    import jax.numpy as jnp

    from tsr_tpu.models import ResUNet, VGG16
    from tsr_tpu.ops import image as image_ops

    # Defaults from the round-4 eval grid (benchmarks/readings/r4): bf16
    # peaks at 512x8 (1505.7 img/s; r5 roofline: the whole 256x8..512x16
    # grid is a ~1510 plateau, MXU-bound at ~65% of bf16 peak —
    # benchmarks/readings/r5/serve_roofline.jsonl). The int8 graph's old
    # batch-384 pin is gone: its batch-512 AOT failure was a compile-time
    # HBM OOM from f32 dequant temps, fixed by bf16 activation storage
    # (docs/DESIGN.md int8 section, round 5) — int8 now shares the bf16
    # headline shape for comparability.
    if int8:
        batch = int(os.environ.get("TSR_BENCH_INT8_BATCH", "512"))
        chunks = int(os.environ.get("TSR_BENCH_INT8_CHUNKS", "8"))
    else:
        batch = int(os.environ.get("TSR_BENCH_BATCH", "512"))
        chunks = int(os.environ.get("TSR_BENCH_CHUNKS", "8"))
    reps = int(os.environ.get("TSR_BENCH_REPS", "3"))
    dtype = jnp.bfloat16

    restorer = ResUNet(dtype=dtype)
    judge = VGG16(num_classes=43, dtype=dtype)
    k = jax.random.PRNGKey(0)
    rv = restorer.init(k, jnp.zeros((1, size, size, 3), jnp.float32),
                       train=False)
    jv = judge.init(k, jnp.zeros((1, size, size, 3), jnp.float32))
    if int8:
        from tsr_tpu import quant

        rapply, rv = quant.quantized_restorer(restorer, rv)
        japply, jv = quant.quantized_judge(judge, jv)
    else:
        rapply = lambda v, x: restorer.apply(v, x, train=False)  # noqa: E731
        japply = lambda v, x: judge.apply(v, x)                  # noqa: E731

    @jax.jit
    def fused(rvars, jvars, images_u8):
        """[K, B, H, W, 3] uint8 -> per-image predictions [K, B]."""

        def body(_, chunk):
            x01 = image_ops.to_float01(chunk)
            out = rapply(rvars, x01)
            out = jnp.clip(out, 0.0, 1.0)
            out = jnp.trunc(out * 255.0) / 255.0  # PNG round-trip parity
            logits = japply(jvars, image_ops.imagenet_normalize(out))
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
    return chunks * batch / dt


def _training_throughputs(size, batch=64, steps=8, unified_batch=128):
    """img/s of the two training hot paths, scanned on-device (bf16).

    The unified step runs at its measured-optimal config — batch 128 with
    the selective vgg-branch remat (benchmarks/train_profile.py sweep,
    RESULTS.md roofline: 371.7 img/s vs 283.7 at batch 64; batch 192
    overflows 16 GB HBM)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tsr_tpu import configs
    from tsr_tpu.models import ResUNet, VGG16
    from tsr_tpu.models.vgg import PERCEPTUAL_TAP
    from tsr_tpu.train import common

    rng = np.random.default_rng(1)
    imgs = jax.device_put(rng.integers(
        0, 256, (steps, batch, size, size, 3), dtype=np.uint8))
    labels = jax.device_put(rng.integers(
        0, 43, (steps, batch), dtype=np.int32))

    def timed_scan(step_fn, state, per_step_args, bs=batch):
        @jax.jit
        def run(st, args):
            def body(c, a):
                st2, aux = step_fn(c, *a)
                return st2, aux["loss"]
            st, losses = jax.lax.scan(body, st, args)
            return st, jnp.sum(losses)

        float(run(state, per_step_args)[1])  # compile + warmup
        t0 = time.perf_counter()
        float(run(state, per_step_args)[1])
        return steps * bs / (time.perf_counter() - t0)

    # Judge training (ref:05:75-87 hot loop, device-resident equivalent).
    jcfg = configs.JudgeTrainConfig(optimizer="adamw", learning_rate=3e-4,
                                    batch_size=batch)
    judge = VGG16(num_classes=43, dtype=jnp.bfloat16)
    jv = judge.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, size, size, 3), jnp.float32))
    jstate = common.TrainState.create(
        judge.apply, jv, common.judge_optimizer(jcfg))
    jstep = common.make_judge_train_step(jit=False)
    keys = jax.random.split(jax.random.PRNGKey(2), steps)
    judge_ips = timed_scan(jstep, jstate, (imgs, labels, keys))
    del jstate, labels  # free the SGD/AdamW moments before the next graph

    # Unified training (ref:14:232-246 hot loop: on-device distort +
    # ResUNet + L1 + 0.1*perceptual + AdamW).
    uimgs = jax.device_put(rng.integers(
        0, 256, (steps, unified_batch, size, size, 3), dtype=np.uint8))
    ucfg = configs.UnifiedTrainConfig(batch_size=unified_batch)
    resunet = ResUNet(dtype=jnp.bfloat16)
    rv = resunet.init(jax.random.PRNGKey(1),
                      jnp.zeros((2, size, size, 3), jnp.float32), train=True)
    ustate = common.TrainState.create(
        resunet.apply, rv, optax.adamw(2e-4, weight_decay=1e-4))

    def vgg_apply(x01):
        return judge.apply(jv, x01, train=False,
                           tap_layer=judge.tap_index(PERCEPTUAL_TAP))

    ustep = common.make_unified_train_step(
        ucfg.mix, ucfg.perceptual_weight, vgg_apply, remat="vgg", jit=False)
    unified_ips = timed_scan(ustep, ustate, (uimgs, keys), bs=unified_batch)

    return {"judge_train_img_s": round(judge_ips, 1),
            "unified_train_img_s": round(unified_ips, 1)}


if __name__ == "__main__":
    main()
