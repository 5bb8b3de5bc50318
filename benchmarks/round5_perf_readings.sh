#!/usr/bin/env bash
# Round-5 perf readings that need exclusive TPU (run between queue
# stages): restore_tree batch sweeps (host + device resize modes), the
# corrected-accounting serving roofline, and the un-pinned int8 512x8
# measurement. Each stage skips if its reading already looks complete.
set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
R5="$REPO/benchmarks/readings/r5"
OUT=${OUT:-/tmp/tsr_r5}
mkdir -p "$R5" "$OUT"
. "$REPO/benchmarks/tpu_lib.sh"

if ! grep -q winner_batch "$R5/restore_ab_v1_host.jsonl" 2>/dev/null; then
  wait_tpu
  echo "[perf] restore_ab host" | tee -a "$OUT/queue.log"
  timeout 5400 python "$REPO/benchmarks/restore_ab.py" --n 3072 \
    --batches 32,64,128,256 --resize host --workdir /tmp/tsr_r5_ab \
    > "$R5/restore_ab_v1_host.jsonl" 2>> "$OUT/restore_ab.err"
fi

if ! grep -q winner_batch "$R5/restore_ab_v2_device.jsonl" 2>/dev/null; then
  wait_tpu
  echo "[perf] restore_ab device" | tee -a "$OUT/queue.log"
  timeout 5400 python "$REPO/benchmarks/restore_ab.py" --n 3072 \
    --batches 32,64,128,256,512 --resize device --workdir /tmp/tsr_r5_ab \
    > "$R5/restore_ab_v2_device.jsonl" 2>> "$OUT/restore_ab.err"
fi

# corrected scan-body-once flop accounting (the first run's derived
# fields were off by the trip count; compile cache makes this cheap)
if ! grep -q '"summary"' "$R5/serve_roofline.jsonl" 2>/dev/null \
    || ! grep -q '"gflop_per_img": 8[0-9]' "$R5/serve_roofline.jsonl"; then
  wait_tpu
  echo "[perf] serve_roofline (corrected)" | tee -a "$OUT/queue.log"
  timeout 5400 python "$REPO/benchmarks/serve_roofline.py" \
    > "$R5/serve_roofline.jsonl" 2>> "$OUT/serve_roofline.err"
fi

# int8 at the bf16 headline shape, post-fix (docs/DESIGN.md r5 section)
if ! grep -q '"batch": 512.*img_s' "$R5/int8_512_post_fix.jsonl" \
    2>/dev/null; then
  wait_tpu
  echo "[perf] int8 512 post-fix" | tee -a "$OUT/queue.log"
  timeout 5400 python "$REPO/benchmarks/int8_aot_repro.py" \
    --batches 448,512 --chunks 8 --execute \
    > "$R5/int8_512_post_fix.jsonl" 2>> "$OUT/int8_post.err"
fi

echo "[perf] DONE $(date)" | tee -a "$OUT/queue.log"
