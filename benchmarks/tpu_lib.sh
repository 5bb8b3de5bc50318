# Shared TPU-relay helpers for the round-4 drivers. Source with OUT set;
# the log prefix is the sourcing script's basename.
#
# The axon relay dies for 1h+ stretches (docs/CALIBRATION.md operational
# notes); every TPU-bound stage must go through wait_tpu so an outage
# pauses the pipeline instead of failing it.

tpu_up() {
  timeout 120 python -c "import jax; assert jax.devices()[0].platform not in ('cpu','gpu')" 2>/dev/null
}

wait_tpu() {
  local tag
  tag=$(basename "${BASH_SOURCE[1]:-driver}" .sh)
  while ! tpu_up; do
    echo "[$tag $(date +%H:%M)] TPU down; sleeping 180s" | tee -a "$OUT/queue.log"
    sleep 180
  done
  echo "[$tag $(date +%H:%M)] TPU UP" | tee -a "$OUT/queue.log"
}
