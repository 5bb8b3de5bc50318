"""Decompose the unified train step's 318 ms (round 1) into its stages.

Times each sub-graph separately on the real chip so the hot stage is
identified without xplane tooling:

  distort   on-device random-mix pair generation (ref:14:31-64 equivalent)
  fwd       ResUNet forward only
  fwd+bwd   ResUNet forward+backward+AdamW, L1 pixel loss only
  perc_fwd  the two frozen VGG16 features[:16] forwards of the perceptual
            term (ref:14:238-242)
  full      the shipped make_unified_train_step (L1 + 0.1*perceptual)

Usage: python benchmarks/train_profile.py [--batch 64] [--bf16] [--remat]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def timeit(fn, *args, steps=6, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tsr_tpu import configs
    from tsr_tpu.models import ResUNet, VGG16
    from tsr_tpu.ops import distortions, image as image_ops
    from tsr_tpu.train import common
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    B, S = args.batch, args.size
    mix = configs.RandomMixConfig()

    model = ResUNet(dtype=dtype)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, S, S, 3)),
                   train=True)
    state = common.TrainState.create(
        model.apply, v, optax.adamw(2e-4, weight_decay=1e-4))

    judge = VGG16(num_classes=43, dtype=dtype)
    jv = judge.init(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))

    def vgg_apply(x01):
        return judge.apply(jv, x01, train=False, tap_layer=15)

    clean = jax.device_put(np.random.default_rng(0).integers(
        0, 256, (B, S, S, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(7)
    x01 = jax.jit(lambda c: image_ops.to_float01(c))(clean)
    jax.block_until_ready(x01)

    rows = []

    f_distort = jax.jit(
        lambda c, k: distortions.make_training_pair(c, k, mix))
    rows.append(("distort", timeit(f_distort, clean, key)))

    f_fwd = jax.jit(lambda vars_, x: model.apply(vars_, x, train=False))
    rows.append(("resunet_fwd", timeit(f_fwd, state.variables, x01)))

    step_l1 = common.make_unified_train_step(mix, 0.0, None,
                                             remat=args.remat)
    st = state
    st, aux = step_l1(st, clean, key)
    jax.block_until_ready(aux["loss"])
    t0 = time.perf_counter()
    for i in range(6):
        st, aux = step_l1(st, clean, jax.random.fold_in(key, i))
    jax.block_until_ready(aux["loss"])
    rows.append(("step_l1_only", (time.perf_counter() - t0) / 6))

    f_perc = jax.jit(
        lambda a, b: jnp.mean((vgg_apply(a) - vgg_apply(b)) ** 2))
    rows.append(("perc_fwd_x2", timeit(f_perc, x01, x01 * 0.5)))

    step_full = common.make_unified_train_step(mix, 0.1, vgg_apply,
                                               remat=args.remat)
    st2 = common.TrainState.create(
        model.apply, v, optax.adamw(2e-4, weight_decay=1e-4))
    st2, aux = step_full(st2, clean, key)
    jax.block_until_ready(aux["loss"])
    t0 = time.perf_counter()
    for i in range(6):
        st2, aux = step_full(st2, clean, jax.random.fold_in(key, i))
    jax.block_until_ready(aux["loss"])
    full = (time.perf_counter() - t0) / 6
    rows.append(("step_full", full))

    print(f"batch={B} size={S} bf16={args.bf16} remat={args.remat}")
    for name, dt in rows:
        print(f"  {name:14s} {dt * 1e3:8.1f} ms   "
              f"({B / dt:7.1f} img/s)")
    print(f"  full step throughput: {B / full:.1f} img/s")


if __name__ == "__main__":
    main()
