#!/usr/bin/env bash
# Ref:13 cascade A/B (VERDICT r4 task 3): train the three specialized
# restorers twice on a calibrated work tree — (A) reference-exact
# severe-only recipe, (B) identity-anchored (--identity-frac 0.25) — and
# run benchmarks/cascade_diag.py per variant to get the per-stage
# confidence + PSNR table. Goal: variant B shows the reference's net
# confidence recovery shape (ref:13:226-238: 0.981 clean -> 0.749 mild
# stress -> 0.852 cascade-restored), or the PSNR column shows exactly
# which stage damages the image and why.
#
# Expects a completed calibrate_standin work dir (clean/noise/blur/fog
# trees + judge), e.g. the multi-seed gate's seed-0 dir.
set -eu
REPO=$(cd "$(dirname "$0")/.." && pwd)
CAL=${CAL:-/tmp/tsr_ms_r4_s0}
OUT=${OUT:-/tmp/tsr_r4}
EPOCHS=${EPOCHS:-15}
SAMPLES=${SAMPLES:-32}
IMG=${IMG:-224}      # shrink for CPU dry-runs
BS=${BS:-32}
mkdir -p "$OUT"

train_set() {  # $1 = ckpt dir, extra flags after
  # resume marker is a .done sentinel written AFTER the script exits 0 —
  # the checkpoint dir itself appears at the first mid-training best-val
  # save, so its existence does not mean training completed
  local ckpt=$1; shift
  for task in noise fog; do
    [ -f "$ckpt/.done_$task" ] && continue
    python "$REPO/scripts/07_train_restoration.py" \
      --clean-dir "$CAL/clean" --ckpt-dir "$ckpt" --image-size "$IMG" \
      --bf16 --batch-size "$BS" \
      --task $task --distorted-dir "$CAL/$task" --epochs "$EPOCHS" "$@" \
      && touch "$ckpt/.done_$task"
  done
  if [ ! -f "$ckpt/.done_blur" ]; then
    python "$REPO/scripts/07_train_restoration_advanced.py" \
      --clean-dir "$CAL/clean" --ckpt-dir "$ckpt" --image-size "$IMG" \
      --bf16 --batch-size "$BS" \
      --task blur --distorted-dir "$CAL/blur" --epochs "$EPOCHS" \
      --judge "$CAL/judge" "$@" \
      && touch "$ckpt/.done_blur"
  fi
}

echo "=== variant A: severe-only (reference-exact, ref:07:122-135) ==="
train_set "$OUT/rest_a" --identity-frac 0
echo "=== variant B: identity-anchored 0.25 ==="
train_set "$OUT/rest_b" --identity-frac 0.25

for v in a b; do
  python "$REPO/benchmarks/cascade_diag.py" --work "$CAL" \
    --judge "$CAL/judge" --restorers "$OUT/rest_$v" --image-size "$IMG" \
    --num-samples "$SAMPLES" | tee "$OUT/cascade_$v.json"
done
echo "=== A/B tables at $OUT/cascade_{a,b}.json ==="
