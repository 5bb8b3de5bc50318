"""Prebuild calibration-sweep trees on CPU while the TPU relay is down.

The expensive part of a calibrate_standin config on TPU is judge
training; the clean tree (host-side) and the four distorted trees
(jitted elementwise/conv ops — backend-independent data) can be built
ahead of time on CPU. With trees in place and the sweep running
``--keep``, the TPU window pays only for train+eval (~5-8 min less per
config through the relay).

Builds each tree into a tmp dir and renames into place, so an
interrupted prebuild can never leave a partial tree that ``--keep``
would silently reuse; verifies image counts.

Usage: JAX_PLATFORMS=cpu python benchmarks/prebuild_sweep_trees.py \
           [--work /tmp/tsr_sweep_r4] [--configs T30s64,T45s64,...]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsr_tpu.utils import profiling  # noqa: E402

profiling.honor_cpu_request()

from tsr_tpu import offline  # noqa: E402
from tsr_tpu.data import synthetic  # noqa: E402

# must mirror benchmarks/pick_winner.py FLAGS / sweep_calibration.sh
CONFIGS = {
    "T30s64":    dict(size=64, small_frac=0.3),
    "T45s64":    dict(size=64, small_frac=0.45),
    "T30":       dict(size=72, small_frac=0.3),
    "T45":       dict(size=72, small_frac=0.45),
    "T30s64e24": dict(size=64, small_frac=0.3),
    "T30e24":    dict(size=72, small_frac=0.3),
}
CLASSES, PER_CLASS, JITTER, SEED = 43, 120, 0.45, 0


def build_config(work: Path, name: str, cfg: dict) -> None:
    n_expect = CLASSES * PER_CLASS
    croot = work / name
    old_frac = synthetic.CALIB["size_small_frac"]
    synthetic.CALIB["size_small_frac"] = cfg["small_frac"]
    try:
        clean = croot / "clean"
        if not clean.exists():
            tmp = croot / ".tmp_clean"
            shutil.rmtree(tmp, ignore_errors=True)
            t0 = time.time()
            synthetic.write_image_tree(
                str(tmp), num_classes=CLASSES, per_class=PER_CLASS,
                size=cfg["size"], seed=SEED, size_jitter=JITTER)
            os.rename(tmp, clean)
            print(f"[{name}] clean tree in {time.time() - t0:.0f}s")
        assert len(list(clean.glob("*/*"))) == n_expect, clean
        for kind in ("noise", "blur", "fog", "compound"):
            dst = croot / kind
            if dst.exists():
                continue
            tmp = croot / f".tmp_{kind}"
            shutil.rmtree(tmp, ignore_errors=True)
            t0 = time.time()
            # seed must match calibrate_standin.run_once (seed + 1)
            offline.generate_tree(str(clean), str(tmp), kind, seed=SEED + 1)
            assert len(list(tmp.glob("*/*"))) == n_expect, tmp
            os.rename(tmp, dst)
            print(f"[{name}] {kind} tree in {time.time() - t0:.0f}s")
    finally:
        synthetic.CALIB["size_small_frac"] = old_frac


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="/tmp/tsr_sweep_r4")
    p.add_argument("--configs", default=",".join(CONFIGS))
    args = p.parse_args()
    work = Path(args.work)
    done: dict = {}  # (size, small_frac) -> name already built
    for name in args.configs.split(","):
        cfg = CONFIGS[name]
        key = (cfg["size"], cfg["small_frac"])
        src = done.get(key)
        if src and not (work / name).exists():
            # identical tree config (epoch variants share data): copy
            tmp = work / f".tmp_{name}"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(work / src, tmp)
            os.rename(tmp, work / name)
            print(f"[{name}] copied trees from {src}")
        else:
            build_config(work, name, cfg)
        done[key] = name
    print("prebuild complete")


if __name__ == "__main__":
    main()
