#!/usr/bin/env bash
# Round-4 unattended endgame. Runs AFTER benchmarks/round4_tpu_queue.sh's
# multi-seed gate: ships the gate-validated winner into the repo defaults
# (only if strictly better than the committed B2 config's 4/6 bands),
# regenerates the flagship demo evidence under the shipped config (VERDICT
# r4 task 2), runs the ref:13 cascade A/B (task 3), and measures the
# native-PNG-decode end-to-end img/s delta (task 5). Designed to survive
# relay outages: every heavy step is resumable and wrapped in a bounded
# wait_tpu+retry loop, so the whole endgame lands even with nobody
# watching the session.
#
# Leaves the shipped-default edits UNCOMMITTED (the session or the round
# driver commits them); all run artifacts land under $OUT.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=${OUT:-/tmp/tsr_r4}
WORK=${WORK:-/tmp/tsr_sweep_r4}
DEMO=${DEMO:-/tmp/tsr_demo_r4}
CAL=${CAL:-/tmp/tsr_ms_r4_s0}
QUEUE_PID_FILE=${QUEUE_PID_FILE:-/tmp/r4queue.pid}
mkdir -p "$OUT"
log() { echo "[endgame $(date +%H:%M)] $*" | tee -a "$OUT/endgame.log"; }
. "$REPO/benchmarks/tpu_lib.sh"

# ---- stage 0: wait for the queue's multi-seed gate ----
# While a queue process is alive (it writes its own pid into
# $QUEUE_PID_FILE at startup), just poll. If it died mid-way, restart it
# in the BACKGROUND — the gate result appears in multiseed.log as soon as
# its stage finishes, so shipping (a pure CPU file edit) never waits
# behind the queue's post-gate perf probes.
while ! grep -q '"bands_hit"' "$OUT/multiseed.log" 2>/dev/null; do
  qpid=$(cat "$QUEUE_PID_FILE" 2>/dev/null || echo "")
  if [ -z "$qpid" ] || ! kill -0 "$qpid" 2>/dev/null; then
    log "queue not running; restarting it in background"
    setsid bash "$REPO/benchmarks/round4_tpu_queue.sh" \
      >> "$OUT/endgame_queue.log" 2>&1 &
    sleep 10  # let it write its pid file before we poll again
  fi
  sleep 300
done
log "multi-seed gate result available"

# ---- stage 5: ship the winner (gated) ----
if [ ! -f "$OUT/.done_ship" ]; then
  BANDS=$(grep -o '"bands_hit": [0-9]*' "$OUT/multiseed.log" | tail -1 \
    | grep -o '[0-9]*$')
  # Ship the flags the gate actually validated (persisted by the queue at
  # gate time) — never a re-pick over logs that may have changed since.
  if [ -f "$OUT/winner.flags" ]; then
    WINNER=$(cat "$OUT/winner.flags")
  else
    WINNER=$(python "$REPO/benchmarks/pick_winner.py" "$WORK")
    log "WARNING: no winner.flags from the queue; re-picked: $WINNER"
  fi
  log "multi-seed bands_hit=$BANDS winner flags: $WINNER"
  if [ "${BANDS:-0}" -gt 4 ]; then
    if python "$REPO/benchmarks/ship_winner.py" $WINNER \
        >> "$OUT/endgame.log" 2>&1; then
      log "SHIPPED winner into repo defaults (uncommitted)"
      touch "$OUT/.done_ship"
    else
      # Loud, unretried failure: demo evidence still regenerates below
      # under the committed defaults, but the miss is unmissable in the
      # log and the sentinel stays absent for a manual re-run.
      log "SHIP FAILED (ship_winner.py rc != 0) — continuing with the" \
          "committed defaults; see $OUT/endgame.log"
      touch "$OUT/.failed_ship"
    fi
  else
    log "NOT shipping: multi-seed ${BANDS:-?}/6 does not beat committed 4/6"
    touch "$OUT/.done_ship"
  fi
  python "$REPO/benchmarks/sweep_table.py" "$WORK" \
    --multiseed "$OUT/multiseed.log" > "$OUT/sweep_table.md" \
    2>> "$OUT/endgame.log" || log "sweep_table failed (non-fatal)"
fi

# ---- stage 6: regenerate flagship demo evidence (resumable, ~2h) ----
tries=0
while [ ! -f "$DEMO/.done_12_umap" ] && [ $tries -lt 12 ]; do
  wait_tpu
  log "demo attempt $((tries + 1)) (resumes at first unfinished stage)"
  WORKDIR=$DEMO timeout 14400 bash "$REPO/benchmarks/demo_run.sh" \
    >> "$OUT/demo.log" 2>&1
  log "demo attempt rc=$?"
  tries=$((tries + 1))
done
[ -f "$DEMO/.done_12_umap" ] && log "demo COMPLETE under $DEMO"

# ---- stage 7: ref:13 cascade A/B on the calibrated seed-0 tree ----
if [ -d "$CAL" ]; then
  tries=0
  while ! grep -q '"stages"' "$OUT/cascade_b.json" 2>/dev/null \
      && [ $tries -lt 8 ]; do
    wait_tpu
    log "cascade A/B attempt $((tries + 1))"
    CAL=$CAL OUT=$OUT timeout 14400 \
      bash "$REPO/benchmarks/round4_cascade_ab.sh" \
      >> "$OUT/cascade_ab.log" 2>&1
    log "cascade A/B rc=$?"
    tries=$((tries + 1))
  done
else
  log "no calibrated tree at $CAL; skipping cascade A/B"
fi

# ---- stage 8: native-PNG-decode end-to-end img/s A/B (VERDICT task 5) ----
# The demo's distorted trees mirror the clean tree's .ppm; the PNG-decode
# consumers are the RESTORED trees script 08 writes (.png, ref:09:45), so
# the instrument is script 09's evaluate_directory — native decoder on vs
# forced-cv2 (TSR_NATIVE_IO=0). Same judge, same trees: the img/s delta is
# the decode path alone. Run from $DEMO because the scripts resolve
# data/processed and data/restored relative to CWD (reference convention).
tries=0
while [ -f "$DEMO/.done_08_restore" ] && [ ! -f "$OUT/.done_io_ab" ] \
    && [ $tries -lt 6 ]; do
  ARGS="--clean-dir $DEMO/data/gtsrb/Training --image-size 224 --ckpt-dir $DEMO/ckpt"
  ok=1
  for nat in 1 0; do
    wait_tpu
    log "io A/B TSR_NATIVE_IO=$nat (attempt $((tries + 1)))"
    (cd "$DEMO" && TSR_NATIVE_IO=$nat timeout 3600 \
      python "$REPO/scripts/09_test_baseline.py" $ARGS) \
      > "$OUT/io_ab_native$nat.log" 2>&1 || ok=0
  done
  [ $ok -eq 1 ] && touch "$OUT/.done_io_ab"
  tries=$((tries + 1))
done
grep -h "img/s" "$OUT"/io_ab_native*.log 2>/dev/null \
  | tee -a "$OUT/endgame.log" || true

# ---- stage 9: sync the regenerated figure artifacts into the repo ----
# Scripts 10-13/15 write pic/ and pipeline_results/ relative to CWD
# ($DEMO); the repo ships those as evidence (RESULTS.md points at them).
# Copy only when the producing stages completed, leaving the git diff for
# the session/driver to commit alongside the RESULTS.md rewrite.
if [ -f "$DEMO/.done_12_umap" ]; then
  cp -f "$DEMO"/pic/* "$REPO/pic/" 2>/dev/null \
    && log "synced $DEMO/pic -> repo/pic"
  cp -f "$DEMO"/pipeline_results/* "$REPO/pipeline_results/" 2>/dev/null \
    && log "synced $DEMO/pipeline_results -> repo/pipeline_results"
fi

log "ENDGAME DONE"
