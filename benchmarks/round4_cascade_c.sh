#!/usr/bin/env bash
# Ref:13 cascade, variants beyond the round-4 A/B (cascade_{a,b}.json):
#
#   B' — severe trees (reference-exact ref:02/03/04 strengths) +
#        identity anchor + the min-max fog restorer. Isolates the fog
#        input_minmax contribution against variant B.
#   C  — strength-jittered trees (scripts 02/03/04 --strength-jitter:
#        per-image severities spanning both the severe offline points
#        and the mild ref:13 stress points) + identity anchor + min-max
#        fog. The full severity-robust recipe.
#
# Goal: the reference's net confidence *gain* regime (ref:13:226-238:
# 0.749 mild-stressed -> 0.852 cascade-restored). Variant B measured
# -0.082; the per-stage table attributed the loss to restorers seeing
# off-distribution (mild) severities.
#
# Expects the multi-seed gate's seed-0 calibration work dir (clean/
# noise/blur/fog trees + judge).
set -eu
REPO=$(cd "$(dirname "$0")/.." && pwd)
CAL=${CAL:-/tmp/tsr_ms_r4_s0}
OUT=${OUT:-/tmp/tsr_r4}
EPOCHS=${EPOCHS:-15}
SAMPLES=${SAMPLES:-32}
IMG=${IMG:-224}
BS=${BS:-32}
mkdir -p "$OUT"

# --- jittered trees for variant C (resumable per-tree) ---------------
JIT="$OUT/jit_trees"
mkdir -p "$JIT"
for task in noise blur fog; do
  [ -f "$JIT/.done_$task" ] && continue
  num=$(case $task in noise) echo 02;; blur) echo 03;; fog) echo 04;; esac)
  python "$REPO/scripts/${num}_gen_$task.py" --strength-jitter \
    --clean-dir "$CAL/clean" --dst "$JIT/$task" \
    && touch "$JIT/.done_$task"
done

train_set() {  # $1 = ckpt dir, $2 = tree root, extra flags after
  local ckpt=$1 trees=$2; shift 2
  for task in noise fog; do
    [ -f "$ckpt/.done_$task" ] && continue
    extra=""
    [ "$task" = fog ] && extra="--input-minmax"
    python "$REPO/scripts/07_train_restoration.py" \
      --clean-dir "$CAL/clean" --ckpt-dir "$ckpt" --image-size "$IMG" \
      --bf16 --batch-size "$BS" --identity-frac 0.25 $extra \
      --task $task --distorted-dir "$trees/$task" --epochs "$EPOCHS" "$@" \
      && touch "$ckpt/.done_$task"
  done
  if [ ! -f "$ckpt/.done_blur" ]; then
    python "$REPO/scripts/07_train_restoration_advanced.py" \
      --clean-dir "$CAL/clean" --ckpt-dir "$ckpt" --image-size "$IMG" \
      --bf16 --batch-size "$BS" --identity-frac 0.25 \
      --task blur --distorted-dir "$trees/blur" --epochs "$EPOCHS" \
      --judge "$CAL/judge" "$@" \
      && touch "$ckpt/.done_blur"
  fi
}

echo "=== variant B': severe trees + anchor + minmax fog ==="
train_set "$OUT/rest_bp" "$CAL"
echo "=== variant C: jittered trees + anchor + minmax fog ==="
train_set "$OUT/rest_c" "$JIT"

for v in bp c; do
  python "$REPO/benchmarks/cascade_diag.py" --work "$CAL" \
    --judge "$CAL/judge" --restorers "$OUT/rest_$v" --image-size "$IMG" \
    --num-samples "$SAMPLES" | tee "$OUT/cascade_$v.json"
done
echo "=== tables at $OUT/cascade_{bp,c}.json (A/B at cascade_{a,b}.json) ==="
