#!/usr/bin/env bash
# Round-5 TPU queue (VERDICT r4 tasks 2/3/4/7/8). Same contract as the
# round-4 queue: every TPU stage goes through wait_tpu so a relay outage
# pauses instead of failing; completed stages are skipped on re-run.
#
# Order: cheap perf artifacts first (roofline, int8 bisect), then the
# 5-seed acceptance gate (the statistical headline), then the trained-
# checkpoint consumers (serving-variants table), then the photo_degrade
# compound A/B sweep.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=${OUT:-/tmp/tsr_r5}
R5="$REPO/benchmarks/readings/r5"
MS=${MS:-/tmp/tsr_ms_r5}
mkdir -p "$OUT" "$R5"
echo $$ > "${QUEUE_PID_FILE:-/tmp/r5queue.pid}"
. "$REPO/benchmarks/tpu_lib.sh"

# The shipped calibration winner (docs/CALIBRATION.md r4: T30s64e24).
WFLAGS="--classes 43 --per-class 120 --no-batchnorm --size 64
        --size-jitter 0.45 --calib size_small_frac=0.3 --epochs 24"

# ---- stage 1: serving roofline + super-batch grid (task 2) ----
if ! grep -q '"summary"' "$R5/serve_roofline.jsonl" 2>/dev/null; then
  wait_tpu
  echo "[queue] stage 1: serve_roofline" | tee -a "$OUT/queue.log"
  timeout 5400 python "$REPO/benchmarks/serve_roofline.py" \
    > "$R5/serve_roofline.jsonl" 2> "$OUT/serve_roofline.err"
  echo "[queue] serve_roofline rc=$?" | tee -a "$OUT/queue.log"
fi

# ---- stage 2: int8 batch-512 AOT failure bisect (task 7) ----
if ! grep -q '"batch": 512' "$R5/int8_aot.jsonl" 2>/dev/null; then
  wait_tpu
  echo "[queue] stage 2: int8_aot_repro" | tee -a "$OUT/queue.log"
  timeout 5400 python "$REPO/benchmarks/int8_aot_repro.py" --execute \
    > "$R5/int8_aot.jsonl" 2> "$OUT/int8_aot.err"
  echo "[queue] int8_aot rc=$?" | tee -a "$OUT/queue.log"
fi

# ---- stage 3: 5-seed acceptance gate on the shipped winner (task 4) ----
if ! grep -q '"bands_hit"' "$OUT/multiseed5.log" 2>/dev/null; then
  wait_tpu
  echo "[queue] stage 3: 5-seed gate" | tee -a "$OUT/queue.log"
  timeout 28800 python "$REPO/benchmarks/calibrate_standin.py" \
    --work "$MS" --seeds 5 --keep $WFLAGS > "$OUT/multiseed5.log" 2>&1
  echo "[queue] multiseed5 rc=$? (exit = bands missed)" \
    | tee -a "$OUT/queue.log"
fi

# ---- stage 4: unified ResUNet on the gate's seed-0 trees ----
UNIFIED="${MS}_s0/ckpt/restoration_unified_resnet"
if [ -d "${MS}_s0/clean" ] && [ ! -f "$OUT/.done_unified" ]; then
  wait_tpu
  echo "[queue] stage 4: unified train" | tee -a "$OUT/queue.log"
  timeout 7200 python "$REPO/scripts/14_train_unified_advanced.py" \
    --clean-dir "${MS}_s0/clean" --image-size 224 --bf16 \
    --judge "${MS}_s0/judge" --save "$UNIFIED" \
    --epochs 25 --batch-size 64 > "$OUT/unified_train.log" 2>&1 \
    && touch "$OUT/.done_unified"
  echo "[queue] unified rc=$?" | tee -a "$OUT/queue.log"
fi

# ---- stage 5: serving-variants table (task 8) ----
if [ -f "$OUT/.done_unified" ] \
    && ! grep -q "int8 fused" "$R5/serve_variants.jsonl" 2>/dev/null; then
  wait_tpu
  echo "[queue] stage 5: serve_variants" | tee -a "$OUT/queue.log"
  timeout 7200 python "$REPO/benchmarks/serve_variants.py" \
    --clean "${MS}_s0/clean" --compound "${MS}_s0/compound" \
    --judge "${MS}_s0/judge" --unified "$UNIFIED" \
    > "$R5/serve_variants.jsonl" 2> "$OUT/serve_variants.err"
  echo "[queue] serve_variants rc=$?" | tee -a "$OUT/queue.log"
fi

# ---- stage 6: photo_degrade compound A/B sweep (task 3) ----
# pd=0 is the gate itself (stage 3); each point is a fresh single-seed
# calibration run with the silhouette-degradation knob turned up.
for pd in 0.35 0.7 1.0; do
  if ! grep -q '"bands_hit"' "$OUT/photo_$pd.log" 2>/dev/null; then
    wait_tpu
    echo "[queue] stage 6: photo_degrade=$pd" | tee -a "$OUT/queue.log"
    timeout 10800 python "$REPO/benchmarks/calibrate_standin.py" \
      --work "/tmp/tsr_pd_$pd" --seeds 1 --keep --no-gate $WFLAGS \
      --calib photo_degrade=$pd > "$OUT/photo_$pd.log" 2>&1
    echo "[queue] photo_degrade=$pd rc=$?" | tee -a "$OUT/queue.log"
  fi
done

echo "[queue] DONE $(date)" | tee -a "$OUT/queue.log"
