"""Profiling / tracing / compilation-cache utilities.

The reference has zero profiling (SURVEY.md §5 — tqdm only). This module
adds:

- :func:`enable_compilation_cache` — persistent XLA compile cache
  (first-compile of the 224px models takes minutes through a TPU tunnel;
  subsequent processes reuse it),
- :func:`trace` — a ``jax.profiler`` trace context writing TensorBoard-
  readable traces,
- :func:`device_time` — robust wall-timing of a jitted callable with a
  device->host read as the completion barrier (``block_until_ready`` is
  asynchronous through some PJRT relays).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable

import jax
import numpy as np

DEFAULT_CACHE_DIR = os.environ.get(
    "TSR_COMPILE_CACHE", os.path.expanduser("~/.cache/tsr_tpu/xla"))

_cache_enabled = False


def honor_cpu_request() -> None:
    """Honor ``JAX_PLATFORMS=cpu`` under the axon sitecustomize.

    This image's sitecustomize force-registers the axon TPU plugin and
    overrides the JAX_PLATFORMS env var via jax.config at interpreter
    start; an explicit cpu request (tests, CPU dry-runs of TPU drivers)
    must be forced back before any backend initializes. No-op otherwise.
    """
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        from jax._src import xla_bridge as _xb

        if not _xb.backends_are_initialized():
            jax.config.update("jax_platforms", "cpu")
            n_cpu = os.environ.get("TSR_NUM_CPU_DEVICES")
            if n_cpu:
                jax.config.update("jax_num_cpu_devices", int(n_cpu))


def enable_compilation_cache(path: str = DEFAULT_CACHE_DIR) -> None:
    global _cache_enabled
    if _cache_enabled:
        return
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:
        pass  # older jax or read-only fs: not fatal


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tsr_trace"):
    """``with trace(): ...`` writes a TensorBoard trace of the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, reps: int = 3,
                reduce: str = "min") -> float:
    """Time ``fn(*args)`` end-to-end, forcing completion via a host read of
    a small leaf. Returns seconds (min or mean over reps)."""

    def sync(out):
        # Fetch ONE device-side scalar: np.asarray(whole_output) would drag
        # the full buffer through the host link and time the network.
        leaf = jax.tree.leaves(out)[0]
        float(leaf.ravel()[0])

    sync(fn(*args))  # warmup / compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) if reduce == "min" else float(np.mean(times))
