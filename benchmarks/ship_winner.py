"""Apply a calibration-sweep winner to the shipped defaults.

Takes the flag string that ``pick_winner.py`` prints (e.g.
``--size 64 --size-jitter 0.45 --calib size_small_frac=0.3 --epochs 24``)
and rewrites the single-sourced constants every consumer reads:

* ``tsr_tpu/data/synthetic.py`` — ``TREE_SIZE``, ``TREE_JITTER`` and the
  ``CALIB`` knobs named by ``--calib`` overrides (scripts/01 and every
  tree builder go through these, so one edit ships the winner everywhere).
* ``benchmarks/demo_run.sh`` — the judge-epoch default, only when the
  winner carries ``--epochs`` (the sweep's epoch lever is the judge
  training budget; the demo must regenerate evidence under the same one).

Every substitution is asserted to hit exactly once — a refactor that
moves a constant fails loudly instead of silently shipping nothing.

Usage:
    python benchmarks/ship_winner.py [--repo DIR] [--dry-run] FLAGS...
    python benchmarks/ship_winner.py $(python benchmarks/pick_winner.py)

Ref bands the winner closes: /root/reference/README.md:92-110,
/root/reference/13_pipeline_stress_test.py:226-238.
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

def parse_flags(tokens: list[str]) -> dict:
    """calibrate_standin-flag subset -> {size, jitter, epochs, calib{}}."""
    out = {"size": None, "jitter": None, "epochs": None, "calib": {}}
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t == "--size":
            out["size"] = int(tokens[i + 1]); i += 2
        elif t == "--size-jitter":
            out["jitter"] = float(tokens[i + 1]); i += 2
        elif t == "--epochs":
            out["epochs"] = int(tokens[i + 1]); i += 2
        elif t == "--calib":
            k, v = tokens[i + 1].split("=", 1)
            out["calib"][k] = v; i += 2
        else:
            raise SystemExit(f"ship_winner: unrecognized winner flag {t!r}")
    return out


def sub_once(text: str, pattern: str, repl: str, what: str) -> str:
    new, n = re.subn(pattern, repl, text, flags=re.M)
    if n != 1:
        raise SystemExit(
            f"ship_winner: expected exactly 1 match for {what} "
            f"(pattern {pattern!r}), got {n} — constants moved?")
    return new


def ship(repo: Path, win: dict, dry_run: bool = False) -> list[str]:
    """Rewrite shipped defaults; returns human-readable change lines."""
    changes: list[str] = []

    syn_path = repo / "tsr_tpu" / "data" / "synthetic.py"
    syn = syn_path.read_text()
    if win["size"] is not None:
        syn = sub_once(syn, r"^TREE_SIZE = [\d.]+$",
                       f"TREE_SIZE = {win['size']}", "TREE_SIZE")
        changes.append(f"synthetic.TREE_SIZE = {win['size']}")
    if win["jitter"] is not None:
        syn = sub_once(syn, r"^TREE_JITTER = [\d.]+$",
                       f"TREE_JITTER = {win['jitter']}", "TREE_JITTER")
        changes.append(f"synthetic.TREE_JITTER = {win['jitter']}")
    for k, v in win["calib"].items():
        lit = (f"({', '.join(str(float(x)) for x in v.split(','))})"
               if "," in v else str(float(v)))
        syn = sub_once(syn, rf'^(\s*)"{k}": [^#\n]+,',
                       rf'\g<1>"{k}": {lit},', f'CALIB["{k}"]')
        changes.append(f'synthetic.CALIB["{k}"] = {lit}')

    # Only rewrite the demo's judge-epoch default when the winner actually
    # used the epoch lever — an epochs-less winner must not clobber the
    # demo's independently tuned budget.
    demo_path = repo / "benchmarks" / "demo_run.sh"
    demo = None
    if win["epochs"] is not None:
        demo = sub_once(demo_path.read_text(),
                        r"^EPOCHS_JUDGE=\$\{EPOCHS_JUDGE:-\d+\}$",
                        f"EPOCHS_JUDGE=${{EPOCHS_JUDGE:-{win['epochs']}}}",
                        "demo_run EPOCHS_JUDGE")
        changes.append(f"demo_run.sh EPOCHS_JUDGE default = {win['epochs']}")

    if not dry_run:
        syn_path.write_text(syn)
        if demo is not None:
            demo_path.write_text(demo)
    return changes


def main() -> None:
    # The winner flags themselves start with "--" (e.g. --size 64), which
    # argparse refuses to bind to a positional — so split them out by hand
    # before argparse sees them, keeping only --repo/--dry-run for it.
    import sys
    own, flags = [], []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--repo":
            own += argv[i:i + 2]; i += 2
        elif argv[i] == "--dry-run":
            own.append(argv[i]); i += 1
        else:
            flags.append(argv[i]); i += 1

    p = argparse.ArgumentParser()
    p.add_argument("--repo", type=Path,
                   default=Path(__file__).resolve().parent.parent)
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(own)
    if not flags:
        raise SystemExit("ship_winner: no winner flags given")

    win = parse_flags(flags)
    for line in ship(args.repo, win, dry_run=args.dry_run):
        print(("[dry-run] " if args.dry_run else "[shipped] ") + line)


if __name__ == "__main__":
    main()
