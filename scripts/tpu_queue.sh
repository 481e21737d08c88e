#!/bin/bash
# Probe-gated sequential queue of TPU scripts.
#
# Each entry is <script.py>:<job-timeout-seconds>. For every entry, probe
# for a healthy device window (trivial device op, CLAUDE.md chip-weather
# recipe), run the script solo inside the window, then move to the next
# entry — whether or not this one succeeded (each script is fault-isolated
# internally). Per-script probe retries are bounded so one dead day cannot
# starve the rest of the queue forever.
#
#   scripts/tpu_queue.sh "scripts/a.py:1800" "scripts/b.py:2400" ...
#
# Output of each script goes to <script>.log (append).
set -u
RETRIES="${TPU_QUEUE_RETRIES:-60}"
cd "$(dirname "$0")/.."
for entry in "$@"; do
  SCRIPT="${entry%%:*}"
  JOB_TIMEOUT="${entry##*:}"
  LOG="${SCRIPT%.py}.log"
  ran=0
  for i in $(seq 1 "$RETRIES"); do
    echo "[tpu_queue $SCRIPT $i] probing @ $(date +%H:%M:%S)" >> "$LOG"
    timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((8,128))+1); print('healthy')" > /tmp/tpu_queue_probe 2>&1
    if grep -q healthy /tmp/tpu_queue_probe; then
      echo "[tpu_queue $SCRIPT $i] healthy; running" >> "$LOG"
      timeout "$JOB_TIMEOUT" python -u "$SCRIPT" >> "$LOG" 2>&1
      rc=$?
      echo "[tpu_queue $SCRIPT $i] exit=$rc" >> "$LOG"
      ran=1
      [ $rc -eq 0 ] && break
      # Non-zero exit inside a healthy window: retry once more only if the
      # script died on a device stall (watchdog exit 3), else move on.
      [ $rc -ne 3 ] && break
    fi
    sleep 90
  done
  [ $ran -eq 0 ] && echo "[tpu_queue $SCRIPT] no window after $RETRIES probes" >> "$LOG"
done
echo "[tpu_queue] done @ $(date +%H:%M:%S)" >> scripts/tpu_queue.log
