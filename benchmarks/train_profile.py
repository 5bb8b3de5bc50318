"""Decompose the unified train step into its stages on the real chip.

Times each sub-graph separately so the hot stage is identified without
xplane tooling:

  distort   on-device random-mix pair generation (ref:14:31-64 equivalent)
  fwd       ResUNet forward only
  fwd+bwd   ResUNet forward+backward+AdamW, L1 pixel loss only
  perc_fwd  the two frozen VGG16 features[:16] forwards of the perceptual
            term (ref:14:238-242)
  full      the shipped make_unified_train_step (L1 + 0.1*perceptual)

Relay-correct timing: every row is amortized by a lax.scan of SCAN_STEPS
iterations inside ONE jit (the axon relay's block_until_ready is async and
per-call RTT is ~30 ms, so timing individual dispatches measures the
network) and completion is forced by a device-side scalar fetch
(utils.profiling.device_time).

Usage: python benchmarks/train_profile.py [--batch 64] [--bf16] [--remat]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

SCAN_STEPS = 6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", nargs="?", const="full",
                   choices=["none", "vgg", "full"], default="none",
                   help="rematerialization placement: 'vgg' checkpoints "
                        "only the perceptual branch (buys bs128 on 16 GB "
                        "without recomputing the ResUNet); 'full' is the "
                        "whole-fwd checkpoint")
    args = p.parse_args()
    args.remat = {"none": False, "full": True, "vgg": "vgg"}[args.remat]

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
    mix = configs.UnifiedTrainConfig().mix  # shipping config (multiscale)

    model = ResUNet(dtype=dtype)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, S, S, 3)),
                   train=True)

    judge = VGG16(num_classes=43, dtype=dtype)
    jv = judge.init(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))

    def vgg_apply(x01):
        return judge.apply(jv, x01, train=False, tap_layer=15)

    clean = jax.device_put(np.random.default_rng(0).integers(
        0, 256, (B, S, S, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(7)
    x01 = jax.jit(lambda c: image_ops.to_float01(c))(clean)

    def fresh_state():
        # donated steps invalidate their input buffers, which alias v:
        # every row starts from a fresh copy
        return common.TrainState.create(
            model.apply, jax.tree.map(jnp.array, v),
            optax.adamw(2e-4, weight_decay=1e-4))

    def scanned_fn(fn, *fn_args):
        """Amortize a stateless fn: scan SCAN_STEPS applications in-graph,
        folding the iteration index in so XLA cannot CSE them away."""

        @jax.jit
        def run(*a):
            def body(c, i):
                out = fn(*a, i)
                return c, jax.tree.leaves(out)[0].ravel()[0]
            _, outs = jax.lax.scan(body, 0.0,
                                   jnp.arange(SCAN_STEPS, dtype=jnp.int32))
            return jnp.sum(outs)

        dt = profiling.device_time(run, *fn_args, reps=3)
        return dt / SCAN_STEPS

    def scanned_step(step_fn, state, keys):
        """Amortize a state-threaded train step via scan with state carry."""

        @jax.jit
        def run(st, ks):
            def body(c, k):
                st2, aux = step_fn(c, clean, k)
                return st2, aux["loss"]
            st, losses = jax.lax.scan(body, st, ks)
            return jnp.sum(losses)

        dt = profiling.device_time(run, state, keys, reps=3)
        return dt / SCAN_STEPS

    keys = jax.random.split(key, SCAN_STEPS)
    rows = []

    rows.append(("distort", scanned_fn(
        lambda i: distortions.make_training_pair(
            clean, jax.random.fold_in(key, i), mix)[0])))

    rows.append(("resunet_fwd", scanned_fn(
        lambda i: model.apply(v, x01 + 0.0 * i, train=False))))

    step_l1 = common.make_unified_train_step(mix, 0.0, None,
                                             remat=args.remat, jit=False)
    rows.append(("step_l1_only", scanned_step(step_l1, fresh_state(), keys)))

    rows.append(("perc_fwd_x2", scanned_fn(
        lambda i: jnp.mean((vgg_apply(x01 + 0.0 * i)
                            - vgg_apply(x01 * 0.5)) ** 2))))

    step_full = common.make_unified_train_step(mix, 0.1, vgg_apply,
                                               remat=args.remat, jit=False)
    full = scanned_step(step_full, fresh_state(), keys)
    rows.append(("step_full", full))

    print(f"batch={B} size={S} bf16={args.bf16} remat={args.remat}")
    for name, dt in rows:
        print(f"  {name:14s} {dt * 1e3:8.1f} ms   "
              f"({B / dt:7.1f} img/s)")
    print(f"  full step throughput: {B / full:.1f} img/s")


if __name__ == "__main__":
    main()
