#!/bin/bash
# Run a TPU script with health-window retries.
#
# The tunneled chip alternates between healthy windows and multi-minute
# outages (see CLAUDE.md). This wrapper probes with a trivial device op and
# only launches the real job inside a healthy window, retrying otherwise.
#
#   scripts/tpu_run.sh <script.py> [job-timeout-seconds] [max-retries]
#
# Output goes to <script>.log next to the script.
set -u
SCRIPT="$1"
JOB_TIMEOUT="${2:-900}"
RETRIES="${3:-30}"
LOG="${SCRIPT%.py}.log"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$RETRIES"); do
  echo "[tpu_run $i] probing @ $(date +%H:%M:%S)" >> "$LOG"
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((8,128))+1); print('healthy')" > /tmp/tpu_run_probe 2>&1
  if grep -q healthy /tmp/tpu_run_probe; then
    echo "[tpu_run $i] healthy; running $SCRIPT" >> "$LOG"
    timeout "$JOB_TIMEOUT" python -u "$SCRIPT" >> "$LOG" 2>&1
    rc=$?
    echo "[tpu_run $i] exit=$rc" >> "$LOG"
    [ $rc -eq 0 ] && exit 0
  fi
  sleep 90
done
echo "[tpu_run] gave up after $RETRIES attempts" >> "$LOG"
exit 1
