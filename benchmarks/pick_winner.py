"""Pick the calibration-sweep winner from sweep logs.

Reads each ``<work>/<name>.log`` written by sweep_calibration.sh, takes
the last parseable result JSON (calibrate_standin.py's final line), and
prints the winning config's calibrate_standin flags. Ranking: most bands
hit, ties broken by distance of the two historically-open bands
(compound, mild_conf) to the reference values — the closer config has
more headroom for the multi-seed gate.

Usage: python benchmarks/pick_winner.py /tmp/tsr_sweep_r4
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

FLAGS = {
    "T30":    "--size 72 --size-jitter 0.45 --calib size_small_frac=0.3",
    "T45":    "--size 72 --size-jitter 0.45 --calib size_small_frac=0.45",
    "T30s64": "--size 64 --size-jitter 0.45 --calib size_small_frac=0.3",
    "T45s64": "--size 64 --size-jitter 0.45 --calib size_small_frac=0.45",
    "T30s64e24": "--size 64 --size-jitter 0.45 "
                 "--calib size_small_frac=0.3 --epochs 24",
    "T30e24": "--size 72 --size-jitter 0.45 "
              "--calib size_small_frac=0.3 --epochs 24",
}
REF = {"compound": 0.0578, "mild_conf": 0.749}
FALLBACK = "T30s64"  # both-lever config: the diagnosed fix for both bands


def last_result(text: str):
    """Last parseable calibrate_standin result JSON in ``text`` (or None).

    Tolerates truncated lines (a timeout can kill the run mid-print)."""
    for line in reversed(text.splitlines()):
        if line.startswith("{") and '"bands_hit"' in line:
            try:
                r = json.loads(line)
                float(r["mean"]["compound"])
                float(r["mean"]["mild_conf"])
                int(r["bands_hit"])
                return r
            except (ValueError, KeyError, TypeError):
                continue
    return None


def pick(work: Path):
    """-> (name, flags, result|None); falls back to FALLBACK if no log
    parsed."""
    best = None
    best_key = None
    for name, fl in FLAGS.items():
        log = work / f"{name}.log"
        if not log.exists():
            continue
        r = last_result(log.read_text())
        if r is None:
            continue
        dist = sum(abs(r["mean"][k] - REF[k]) for k in REF)
        key = (r["bands_hit"], -dist)
        if best_key is None or key > best_key:
            best, best_key = (name, fl, r), key
    return best or (FALLBACK, FLAGS[FALLBACK], None)


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tsr_sweep_r4")
    name, flags, r = pick(work)
    if r is not None:
        print(f"[pick_winner] {name}: bands_hit={r['bands_hit']} "
              f"compound={r['mean']['compound'] * 100:.1f} "
              f"mild={r['mean']['mild_conf'] * 100:.1f}", file=sys.stderr)
    else:
        print(f"[pick_winner] no parseable sweep logs under {work}; "
              f"falling back to {name}", file=sys.stderr)
    print(flags)


if __name__ == "__main__":
    main()
