#!/usr/bin/env bash
# Full reference-equivalent pipeline at reference resolution (224) on a
# 43-class synthetic GTSRB stand-in. Produces RESULTS artifacts under
# $WORKDIR and prints every report. Expected wall-clock: ~2h on one v5e
# chip (dominated by first-time compiles through the TPU tunnel).
#
# Resumable: each stage drops a $WORKDIR/.done_<name> sentinel on success
# and is skipped on re-run — a relay outage mid-run costs one stage, not
# the whole 2h (re-run the script; rm $WORKDIR/.done_* for a fresh pass).
set -e
WORKDIR=${WORKDIR:-/tmp/tsr_demo}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CLEAN=$WORKDIR/data/gtsrb/Training
CKPT=$WORKDIR/ckpt
# Reference budgets (ref:07:133 15ep, ref:14:15 25ep). The judge is the
# reference's exact plain VGG16 (no BN), trained from scratch with
# AdamW(3e-4)+warmup+clip for 60 epochs — the calibration-validated
# recipe; the ref's 10-epoch SGD(1e-3) fine-tune assumes ImageNet init
# (see RESULTS.md judge ablation). Training runs device-resident in bf16.
EPOCHS_JUDGE=${EPOCHS_JUDGE:-24}
LR_JUDGE=${LR_JUDGE:-3e-4}
# Judge CE label smoothing. Keep 0: the calibration sweep (docs/
# CALIBRATION.md r3) found even LS 0.05 collapses off-distribution
# confidence to ~0.56 (below the ref:13 mild band) while inflating
# noise/fog/compound robustness out of their bands.
LS_JUDGE=${LS_JUDGE:-0}
EPOCHS_REST=${EPOCHS_REST:-15}
EPOCHS_UNI=${EPOCHS_UNI:-25}
# Identity-anchor fraction for the specialized restorers: a slice of each
# batch trains on (clean -> clean) so the restorers do no harm on mild or
# clean inputs instead of over-correcting (ref:13 cascade regime).
ID_FRAC=${ID_FRAC:-0.25}
ARGS="--clean-dir $CLEAN --image-size 224 --ckpt-dir $CKPT"

mkdir -p $WORKDIR && cd $WORKDIR

stage() {  # stage <name> <cmd...>: skip when done, sentinel on success
  local name=$1; shift
  if [ -f "$WORKDIR/.done_$name" ]; then
    echo "=== [$name] already done (rm $WORKDIR/.done_$name to redo) ==="
    return 0
  fi
  echo "=== [$name] ==="
  "$@"
  touch "$WORKDIR/.done_$name"
}

stage 01_data python $REPO/scripts/01_download_data.py $ARGS --synthetic \
  --synthetic-classes 43 --synthetic-per-class 120
stage 02_noise python $REPO/scripts/02_gen_noise.py $ARGS
stage 03_blur python $REPO/scripts/03_gen_blur.py $ARGS
stage 04_fog python $REPO/scripts/04_gen_fog.py $ARGS
stage 16_compound python $REPO/scripts/16_gen_compound_data.py $ARGS
stage 05_judge python $REPO/scripts/05_train_baseline.py $ARGS --bf16 \
  --optimizer adamw --epochs $EPOCHS_JUDGE --lr $LR_JUDGE --batch-size 64 \
  --label-smoothing $LS_JUDGE
stage 06_eval python $REPO/scripts/06_test_baseline.py $ARGS
stage 07_noise python $REPO/scripts/07_train_restoration.py $ARGS --bf16 \
  --task noise --epochs $EPOCHS_REST --identity-frac $ID_FRAC
stage 07_fog python $REPO/scripts/07_train_restoration.py $ARGS --bf16 \
  --task fog --epochs $EPOCHS_REST --identity-frac $ID_FRAC --input-minmax
stage 07_blur python $REPO/scripts/07_train_restoration_advanced.py $ARGS \
  --bf16 --task blur --epochs $EPOCHS_REST --identity-frac $ID_FRAC
stage 08_restore python $REPO/scripts/08_run_inference.py $ARGS
stage 09_eval python $REPO/scripts/09_test_baseline.py $ARGS
stage 14_unified python $REPO/scripts/14_train_unified_advanced.py $ARGS \
  --bf16 --epochs $EPOCHS_UNI
stage 17_restore python $REPO/scripts/17_run_unified_inference.py $ARGS \
  --metrics
stage 18_bench python $REPO/scripts/18_test_unified_benchmark.py $ARGS \
  --fused
stage 10_viz python $REPO/scripts/10_visualize_result.py $ARGS
stage 11_hidden python $REPO/scripts/11_visualize_hidden_states.py $ARGS
stage 13_stress python $REPO/scripts/13_pipeline_stress_test.py $ARGS \
  --num-samples 10
stage 15_demo python $REPO/scripts/15_test_unified.py $ARGS
stage 12_umap python $REPO/scripts/12_generate_umap_pt.py $ARGS --method umap
echo "=== DEMO RUN COMPLETE ==="
ls -la $WORKDIR
