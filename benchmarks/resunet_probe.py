"""Micro-probe: where does the ResUNet forward spend its time on-chip?

The unified-step profile (train_profile.py) shows the ResUNet fwd at ~45%
of bf16 peak; fwd+bwd ~3x fwd. This times isolated sub-graphs — per-level
residual blocks, the ConvTranspose upsamplers, BatchNorm train vs eval,
PReLU vs ReLU — against their analytic FLOPs, to find which op XLA lowers
badly. Same relay-correct amortized timing as train_profile
(in-graph lax.scan + device scalar fetch).

Usage: python benchmarks/resunet_probe.py [--batch 64] [--size 224]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

SCAN_STEPS = 8
PEAK_BF16 = 197e12  # v5e


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tsr_tpu.models import ResUNet
    from tsr_tpu.models.resunet import ResidualBlock
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()
    B, S = args.batch, args.size
    dt_ = jnp.bfloat16

    def scanned(fn, *fn_args):
        @jax.jit
        def run(*a):
            def body(c, i):
                out = fn(*a, i)
                return c, jnp.asarray(out, jnp.float32).ravel()[0]
            _, outs = jax.lax.scan(body, 0.0,
                                   jnp.arange(SCAN_STEPS, dtype=jnp.int32))
            return jnp.sum(outs)

        t = profiling.device_time(run, *fn_args, reps=3)
        return t / SCAN_STEPS

    def report(name, dt, flops):
        eff = flops / dt / PEAK_BF16 * 100
        print(f"  {name:32s} {dt * 1e3:8.2f} ms  {flops / 1e9:8.1f} GFLOP"
              f"  {eff:5.1f}% of peak")

    rng = jax.random.PRNGKey(0)

    def conv_flops(hw, cin, cout, k):
        return 2 * B * hw * hw * cin * cout * k * k

    rows = []

    # per-level residual blocks (train=False), matching the ResUNet levels
    for hw, cin, cout in ((S, 64, 64), (S // 2, 64, 128),
                          (S // 4, 128, 256), (S // 8, 256, 512),
                          # decoder blocks see concat'd (2x) input channels
                          (S // 4, 512, 256), (S // 2, 256, 128),
                          (S, 128, 64)):
        blk = ResidualBlock(cout, dtype=dt_)
        x = jnp.zeros((B, hw, hw, cin), dt_)
        v = blk.init(rng, x, train=False)
        fl = (conv_flops(hw, cin, cout, 3) + conv_flops(hw, cout, cout, 3)
              + (conv_flops(hw, cin, cout, 1) if cin != cout else 0))
        t = scanned(lambda i, b=blk, vv=v, xx=x:
                    b.apply(vv, xx + 0.0 * i, train=False))
        rows.append((f"resblock {cin}->{cout} @{hw}", t, fl))

    # ConvTranspose upsamplers
    for hw, cin, cout in ((S // 8, 512, 256), (S // 4, 256, 128),
                          (S // 2, 128, 64)):
        up = nn.ConvTranspose(cout, (2, 2), strides=(2, 2), dtype=dt_)
        x = jnp.zeros((B, hw, hw, cin), dt_)
        v = up.init(rng, x)
        fl = 2 * B * (2 * hw) ** 2 * cout * cin
        t = scanned(lambda i, u=up, vv=v, xx=x: u.apply(vv, xx + 0.0 * i))
        rows.append((f"convT {cin}->{cout} @{hw}->{2 * hw}", t, fl))

    # BatchNorm train-mode vs eval-mode on the biggest tensor
    x = jnp.zeros((B, S, S, 64), dt_)
    bn = nn.BatchNorm(use_running_average=False, dtype=dt_)
    v = bn.init(rng, x)
    t = scanned(lambda i: bn.apply(v, x + 0.0 * i,
                                   mutable=["batch_stats"])[0])
    rows.append((f"BN train @{S}x64", t, 0))
    bne = nn.BatchNorm(use_running_average=True, dtype=dt_)
    ve = bne.init(rng, x)
    t = scanned(lambda i: bne.apply(ve, x + 0.0 * i))
    rows.append((f"BN eval @{S}x64", t, 0))

    # whole fwd, train both modes
    model = ResUNet(dtype=dt_)
    xi = jnp.zeros((B, S, S, 3), dt_)
    v = model.init(rng, xi, train=True)
    t = scanned(lambda i: model.apply(v, xi + 0.0 * i, train=False))
    rows.append(("ResUNet fwd eval", t, 0))
    t = scanned(lambda i: model.apply(v, xi + 0.0 * i, train=True,
                                      mutable=["batch_stats"])[0])
    rows.append(("ResUNet fwd train(BN)", t, 0))

    print(f"batch={B} size={S} bf16 — per-op probe")
    for name, t, fl in rows:
        if fl:
            report(name, t, fl)
        else:
            print(f"  {name:32s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
