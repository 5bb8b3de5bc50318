"""Render the round-4 calibration sweep as a markdown table.

Reads the per-config logs written by sweep_calibration.sh (and optionally
the multi-seed gate log) and prints the table that goes into
docs/CALIBRATION.md — per-band means, bands-hit count, and the multi-seed
mean±std row for the winner. Band targets: reference README.md:92-110 and
13_pipeline_stress_test.py:226-238.

Usage:
    python benchmarks/sweep_table.py /tmp/tsr_sweep_r4 \
        [--multiseed /tmp/tsr_r4/multiseed.log]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import pick_winner  # noqa: E402

BAND_ORDER = ["clean", "noise", "blur", "fog", "compound", "mild_conf"]


def row(name: str, flags: str, r: dict | None, seeds: int = 1) -> str:
    if r is None:
        return f"| {name} | `{flags}` | " + " — |" * len(BAND_ORDER) + " — |"
    cells = []
    for k in BAND_ORDER:
        m = r["mean"].get(k)
        if m is None:
            cells.append("—")
        elif seeds > 1 and r.get("std"):
            cells.append(f"{m * 100:.1f}±{r['std'][k] * 100:.1f}")
        else:
            cells.append(f"{m * 100:.1f}")
    return (f"| {name} | `{flags}` | " + " | ".join(cells)
            + f" | **{r['bands_hit']}/{r.get('bands_total', 6)}** |")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("work", type=Path, nargs="?",
                   default=Path("/tmp/tsr_sweep_r4"))
    p.add_argument("--multiseed", type=Path, default=None,
                   help="multi-seed gate log; adds a mean±std winner row")
    args = p.parse_args()

    print("| config | levers | " + " | ".join(BAND_ORDER) + " | bands |")
    print("|---|---|" + "---|" * (len(BAND_ORDER) + 1))
    for name, flags in pick_winner.FLAGS.items():
        log = args.work / f"{name}.log"
        r = pick_winner.last_result(log.read_text()) if log.exists() else None
        print(row(name, flags, r))

    if args.multiseed and args.multiseed.exists():
        r = pick_winner.last_result(args.multiseed.read_text())
        if r is not None:
            seeds = max(len(r.get("runs", [])), 1)
            wname, wflags, _ = pick_winner.pick(args.work)
            print(row(f"**winner {wname} ×{seeds} seeds**", wflags, r,
                      seeds=seeds))


if __name__ == "__main__":
    main()
