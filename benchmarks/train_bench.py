"""Training-step throughput: the unified ResUNet step (on-device random-mix
generation + L1(+perceptual) + AdamW) at the reference resolution.

Usage: python benchmarks/train_bench.py [--batch 64] [--perceptual]
Prints ms/step and images/sec. Timing amortizes the relay round-trip by
scanning multiple steps inside one jit (see tsr_tpu.utils.profiling)."""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--perceptual", action="store_true")
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tsr_tpu import configs
    from tsr_tpu.models import ResUNet, VGG16
    from tsr_tpu.train import common
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    model = ResUNet(dtype=dtype)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((2, args.size, args.size, 3)), train=True)
    state = common.TrainState.create(
        model.apply, v, optax.adamw(2e-4, weight_decay=1e-4))

    vgg_apply = None
    if args.perceptual:
        judge = VGG16(num_classes=43, dtype=dtype)
        jv = judge.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, args.size, args.size, 3)))

        def vgg_apply(x01):
            return judge.apply(jv, x01, train=False, tap_layer=15)

    step = common.make_unified_train_step(
        configs.RandomMixConfig(), 0.1, vgg_apply)

    clean = jax.device_put(np.random.default_rng(0).integers(
        0, 256, (args.batch, args.size, args.size, 3), dtype=np.uint8))

    k = jax.random.PRNGKey(0)
    state, aux = step(state, clean, k)  # compile
    float(aux["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        k, sub = jax.random.split(k)
        state, aux = step(state, clean, sub)
    float(aux["loss"])  # completion barrier (scalar host read)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"unified train step: {dt * 1e3:.1f} ms/step "
          f"({args.batch / dt:.1f} img/s) batch={args.batch} "
          f"size={args.size} perceptual={args.perceptual} bf16={args.bf16}")


if __name__ == "__main__":
    main()
