#!/usr/bin/env bash
# Round-5 follow-up: runs after round5_tpu_queue.sh reports DONE.
# Completes the restore_tree reading set (VERDICT r4 task 1) with the
# device-resize sweep on the same 3072-image tree the v0/v1 host sweeps
# used, so the three modes are directly comparable.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=${OUT:-/tmp/tsr_r5}
R5="$REPO/benchmarks/readings/r5"
echo $$ > /tmp/r5followup.pid

# Wait for the main queue to release the TPU.
while ! grep -q "\[queue\] DONE" "$OUT/queue.log" 2>/dev/null; do
  sleep 45
done

. "$REPO/benchmarks/tpu_lib.sh"

if ! grep -q '"resize": "device"' "$R5/restore_ab_v2_device.jsonl" 2>/dev/null; then
  wait_tpu
  echo "[followup] restore_ab --resize device" | tee -a "$OUT/queue.log"
  timeout 3600 python "$REPO/benchmarks/restore_ab.py" \
    --n 3072 --workdir /tmp/tsr_r5_ab --resize device \
    --batches 32,64,128,256 \
    > "$R5/restore_ab_v2_device.jsonl" 2> "$OUT/ab_device.err"
  echo "[followup] device ab rc=$?" | tee -a "$OUT/queue.log"
fi

echo "[followup] DONE $(date)" | tee -a "$OUT/queue.log"
