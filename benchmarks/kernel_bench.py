"""Pallas-vs-XLA benchmark for the per-sample motion-blur correlation.

Three implementations of the random-mix blur stage (ref:14:51-60):
  xla_grouped   ops.blur.filter2d — XLA grouped conv on the MXU (default)
  pallas_dense  kernels.blur_pallas.filter2d_pallas — all K*K taps, VPU
  pallas_sparse kernels.blur_pallas.filter2d_pallas_sparse — only the
                ~4K nonzero line taps (top_k compaction), VPU

Each is timed amortized inside one jit (lax.scan over SCAN_STEPS calls) so
the relay RTT doesn't dominate; reported per-batch.

Usage: python benchmarks/kernel_bench.py [--batch 64] [--size 224]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

SCAN_STEPS = 8


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--max-degree", type=int, default=15)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tsr_tpu.kernels import blur_pallas
    from tsr_tpu.ops import blur as blur_ops
    from tsr_tpu.utils import profiling

    profiling.enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, S, K = args.batch, args.size, args.max_degree
    imgs = jax.device_put(
        rng.uniform(0, 255, (B, S, S, 3)).astype(np.float32))
    degs = jnp.asarray(rng.integers(5, K + 1, B))
    angs = jnp.asarray(rng.uniform(0, 360, B).astype(np.float32))
    kerns = jax.jit(jax.vmap(
        lambda d, a: blur_ops.motion_blur_kernel(d, a, max_degree=K)
    ))(degs, angs)
    jax.block_until_ready(kerns)

    def scanned(fn):
        @jax.jit
        def run(x, k):
            def body(c, _):
                # fold the iteration into the input so XLA can't CSE it
                return c, jnp.mean(fn(c, k))
            _, outs = jax.lax.scan(body, x, None, length=SCAN_STEPS)
            return outs.sum()
        return run

    impls = {
        "xla_grouped": lambda x, k: blur_ops.filter2d(x, k),
        "pallas_dense": lambda x, k: blur_pallas.filter2d_pallas(x, k),
        "pallas_sparse": lambda x, k: blur_pallas.filter2d_pallas_sparse(
            x, k),
    }
    results = {}
    for name, fn in impls.items():
        try:
            run = scanned(fn)
            dt = profiling.device_time(run, imgs, kerns, reps=3)
            results[name] = dt / SCAN_STEPS
            print(f"  {name:14s} {dt / SCAN_STEPS * 1e3:7.2f} ms/batch")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"  {name:14s} FAILED: {type(e).__name__}: {e}")
    if {"xla_grouped", "pallas_sparse"} <= results.keys():
        r = results["xla_grouped"] / results["pallas_sparse"]
        print(f"sparse vs XLA: {r:.2f}x "
              f"({'pallas wins' if r > 1 else 'XLA wins'})")


if __name__ == "__main__":
    main()
