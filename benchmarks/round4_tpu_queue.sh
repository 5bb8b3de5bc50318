#!/usr/bin/env bash
# Round-4 TPU endgame queue. Designed for an unreliable relay (the axon
# tunnel dies for 1h+ stretches): waits for the TPU, captures the cheap
# perf artifact FIRST (round 3 lost its bench number to an outage), then
# drives the calibration sweep + multi-seed acceptance gate — the round's
# headline deliverable — then the band-floor evidence, and only then the
# nice-to-have perf grid probes. Logs under $OUT; safe to re-run —
# completed stages are skipped.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=${OUT:-/tmp/tsr_r4}
WORK=${WORK:-/tmp/tsr_sweep_r4}
mkdir -p "$OUT"
# Liveness contract with round4_endgame.sh: the queue owns its pid file,
# so concurrent duplicate queues can't be started by a watcher that
# doesn't know how the queue was launched.
echo $$ > "${QUEUE_PID_FILE:-/tmp/r4queue.pid}"
. "$REPO/benchmarks/tpu_lib.sh"

# ---- stage 1: bench capture (cheap, do first) ----
if ! grep -q '"value"' "$OUT/bench.json" 2>/dev/null; then
  wait_tpu
  echo "[queue] stage 1: bench.py" | tee -a "$OUT/queue.log"
  TSR_BENCH_RETRIES=2 TSR_BENCH_RETRY_WAIT=120 \
    timeout 3600 python "$REPO/bench.py" > "$OUT/bench.json" 2> "$OUT/bench.err"
  echo "[queue] bench rc=$? -> $OUT/bench.json" | tee -a "$OUT/queue.log"
fi

# ---- stage 2: calibration sweep (resumable per config) ----
# The round's headline (VERDICT r4 task 1) runs before any perf probing:
# if the relay only comes back for a few hours, the acceptance gate must
# be what lands.
need_sweep() {
  for c in T30s64 T45s64 T30 T45 T30s64e24 T30e24; do
    grep -q '"bands_hit"' "$WORK/$c.log" 2>/dev/null || return 0
  done
  return 1
}
tries=0
while need_sweep && [ $tries -lt 8 ]; do
  wait_tpu
  echo "[queue] stage 2: sweep (attempt $((tries + 1)))" | tee -a "$OUT/queue.log"
  WORK=$WORK bash "$REPO/benchmarks/sweep_calibration.sh" \
    >> "$OUT/sweep.log" 2>&1
  tries=$((tries + 1))
done

# ---- stage 3: pick the winner, multi-seed gate it ----
if ! grep -q '"bands_hit"' "$OUT/multiseed.log" 2>/dev/null; then
  WINNER=$(python "$REPO/benchmarks/pick_winner.py" "$WORK")
  # Persist the flags the gate is about to validate: the endgame ships
  # THIS file, never a re-pick (a later queue re-run over completed sweep
  # logs could pick a different, unvalidated config).
  echo "$WINNER" > "$OUT/winner.flags"
  wait_tpu
  echo "[queue] stage 3: multi-seed gate on winner: $WINNER" | tee -a "$OUT/queue.log"
  timeout 14400 python "$REPO/benchmarks/calibrate_standin.py" \
    --work /tmp/tsr_ms_r4 --classes 43 --per-class 120 --epochs 60 \
    --no-batchnorm --seeds 3 $WINNER > "$OUT/multiseed.log" 2>&1
  echo "[queue] multiseed rc=$? (exit = bands missed)" | tee -a "$OUT/queue.log"
fi

# ---- stage 4: band evidence on the gated trees (floor attribution) ----
if [ -d /tmp/tsr_ms_r4_s0 ]; then
  for tree in compound blur; do
    grep -q "DONE tree=$tree" "$OUT/band_diag.log" 2>/dev/null && continue
    wait_tpu
    echo "[queue] stage 4: band_diag tree=$tree" | tee -a "$OUT/queue.log"
    echo "--- tree=$tree ---" >> "$OUT/band_diag.log"
    timeout 1800 python "$REPO/benchmarks/band_diag.py" \
      --work /tmp/tsr_ms_r4_s0 --tree $tree >> "$OUT/band_diag.log" 2>&1 \
      && echo "DONE tree=$tree" >> "$OUT/band_diag.log"
  done
fi

# ---- stage 5: fused-eval batch/chunk grid (headline tuning) ----
# per-config resume: each config re-runs until its log section contains a
# result line (a bare log-file check would mark the stage done after the
# first config survives an outage)
for cfg in "384 4" "512 4" "512 8"; do
  set -- $cfg
  if ! grep -A2 "^--- batch=$1 chunks=$2 ---$" "$OUT/evalgrid.log" \
      2>/dev/null | grep -q '"value"'; then
    wait_tpu
    echo "[queue] stage 5: eval grid batch=$1 chunks=$2" \
      | tee -a "$OUT/queue.log"
    echo "--- batch=$1 chunks=$2 ---" >> "$OUT/evalgrid.log"
    TSR_BENCH_TRAIN=0 TSR_BENCH_BATCH=$1 TSR_BENCH_CHUNKS=$2 \
      timeout 1200 python "$REPO/bench.py" >> "$OUT/evalgrid.log" 2>&1
  fi
done

# ---- stage 6: unified train-step batch probe (r3 grid gap: 128 ok,
# 192 OOM, 160 never tried; >5% win would move bench.py's default) ----
if ! grep -q "img/s" "$OUT/train160.log" 2>/dev/null; then
  wait_tpu
  echo "[queue] stage 6: train_profile batch 160" | tee -a "$OUT/queue.log"
  timeout 2400 python "$REPO/benchmarks/train_profile.py" \
    --bf16 --batch 160 --remat vgg > "$OUT/train160.log" 2>&1
  echo "[queue] train160 rc=$?" | tee -a "$OUT/queue.log"
fi

echo "[queue] DONE $(date)" | tee -a "$OUT/queue.log"
