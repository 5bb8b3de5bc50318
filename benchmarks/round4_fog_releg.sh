#!/usr/bin/env bash
# Re-run ONLY the fog leg of the demo under the shipped config (demo_run.sh
# stage 07_fog now passes --input-minmax, commit "Fog restorer: per-image
# min-max input stretch") and re-evaluate, so RESULTS.md's fog-restored row
# reflects the shipped configuration. Ref legs: /root/reference/07_train_
# restoration_model.py + 08/09.
set -eu
REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${WORK:-/tmp/tsr_demo_r4}
ARGS="--clean-dir $WORK/data/gtsrb/Training --image-size 224 --ckpt-dir $WORK/ckpt"
cd "$WORK"  # scripts resolve data/processed + data/restored relative to CWD
python "$REPO/scripts/07_train_restoration.py" $ARGS --bf16 \
  --task fog --epochs "${EPOCHS_REST:-15}" --identity-frac 0.25 --input-minmax
python "$REPO/scripts/08_run_inference.py" $ARGS --tasks fog
python "$REPO/scripts/09_test_baseline.py" $ARGS
