#!/usr/bin/env bash
# Round-4 calibration sweep: close the last two bands (compound <=10,
# mild_conf in [0.60, 0.85]) via the two levers diagnosed in round 3
# (docs/CALIBRATION.md findings 7+8):
#   * size_small_frac — route a fraction of tree images to 26-40 px
#     natives (GTSRB's bottom-skewed crop sizes) so blur-10 destroys the
#     sign *template*, not just the glyph -> breaks the ~14-16% compound
#     structural floor (target: reference 5.78%, band [0,10]).
#   * native size    — 72 -> 60-64 px shrinks all natives; run I measured
#     mild_conf 0.774 at size 60 (reference 0.749, band [0.60,0.85]).
#
# Each config is one full calibrate_standin run (fresh tree + 4 distorted
# trees + 60-epoch plain-VGG16 judge + 6-band scoring). ~20-40 min/config
# on one v5e. Logs land in $WORK/<name>.log; a summary table prints at the
# end. After picking a winner, gate it with:
#   python benchmarks/calibrate_standin.py ... --seeds 3   # exit = #missed
#
# Ref targets: /root/reference/README.md:92-110 (accuracy bands),
# /root/reference/13_pipeline_stress_test.py:226-238 (mild confidence).
set -u -o pipefail  # rc must reflect the python run, not tee
REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${WORK:-/tmp/tsr_sweep_r4}
EPOCHS=${EPOCHS:-60}
# --keep: reuse prebuilt trees (benchmarks/prebuild_sweep_trees.py builds
# them on CPU during relay outages) and survive re-runs without rebuilding
BASE="--classes 43 --per-class 120 --epochs $EPOCHS --no-batchnorm --no-gate --keep"
mkdir -p "$WORK"

run_cfg() {
  local name=$1; shift
  local log="$WORK/$name.log"
  if grep -q '"bands_hit"' "$log" 2>/dev/null; then
    echo "[$name] already done ($log)"; return
  fi
  echo "[$name] starting: $*"
  # bounded: a relay outage mid-run should not wedge the sweep forever
  timeout 7200 python "$REPO/benchmarks/calibrate_standin.py" \
    --work "$WORK/$name" $BASE "$@" 2>&1 | tee "$log"
  echo "[$name] rc=$?"
}

# B2 shipped config = size 72 / jitter .45 / veil_t .30 / LS 0 (4/6 bands;
# compound 15.5, mild 0.909). The sweep moves the two diagnosed levers
# (small-native tail, native size) plus the secondary epoch lever
# (finding 7: B2 at 24 ep gives mild 0.861 vs 0.909 at 60, clean stays in
# band). Most promising configs first — both-lever moves target both open
# bands at once.
run_cfg T30s64 --size 64 --size-jitter 0.45 --calib size_small_frac=0.3
run_cfg T45s64 --size 64 --size-jitter 0.45 --calib size_small_frac=0.45
run_cfg T30    --size 72 --size-jitter 0.45 --calib size_small_frac=0.3
run_cfg T45    --size 72 --size-jitter 0.45 --calib size_small_frac=0.45
run_cfg T30s64e24 --size 64 --size-jitter 0.45 \
  --calib size_small_frac=0.3 --epochs 24
run_cfg T30e24 --size 72 --size-jitter 0.45 \
  --calib size_small_frac=0.3 --epochs 24

echo "=== sweep summary ==="
for log in "$WORK"/*.log; do
  name=$(basename "$log" .log)
  line=$(grep -o '"bands_hit": [0-9]*' "$log" | tail -1)
  echo "$name: ${line:-INCOMPLETE}"
  grep -E '^\s+\[(OK |MISS)\]' "$log" | tail -6
done
