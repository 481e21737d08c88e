#!/bin/bash
# Probe-gated sequential queue with a SHARED probe budget.
#
# Unlike tpu_queue.sh (per-entry retry budget: a dead chip burns hours of
# probes on the first entry while the rest starve), this runner keeps ONE
# probe loop; whenever a probe finds a healthy window it runs the next
# pending entry. Entries complete (exit 0) or are retried on the next
# window up to MAX_TRIES each; other exits after MAX_TRIES drop the entry.
#
#   scripts/tpu_queue2.sh "scripts/a.py:600" "scripts/b.py:1800" ...
#
# Env: TPU_QUEUE2_PROBES (total probes, default 240 ~= 12h at 3 min),
#      TPU_QUEUE2_MAX_TRIES (per-entry, default 2).
set -u
PROBES="${TPU_QUEUE2_PROBES:-240}"
MAX_TRIES="${TPU_QUEUE2_MAX_TRIES:-2}"
cd "$(dirname "$0")/.."
declare -a SCRIPTS TIMEOUTS TRIES DONE
i=0
for entry in "$@"; do
  SCRIPTS[$i]="${entry%%:*}"
  TIMEOUTS[$i]="${entry##*:}"
  TRIES[$i]=0
  DONE[$i]=0
  i=$((i + 1))
done
N=$i
QLOG=scripts/tpu_queue2.log
for p in $(seq 1 "$PROBES"); do
  pending=-1
  for j in $(seq 0 $((N - 1))); do
    if [ "${DONE[$j]}" -eq 0 ] && [ "${TRIES[$j]}" -lt "$MAX_TRIES" ]; then
      pending=$j
      break
    fi
  done
  [ $pending -lt 0 ] && break
  echo "[q2 $p] probing @ $(date +%H:%M:%S) next=${SCRIPTS[$pending]}" >> "$QLOG"
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((8,128))+1); print('healthy')" > /tmp/tpu_q2_probe 2>&1
  if grep -q healthy /tmp/tpu_q2_probe; then
    S="${SCRIPTS[$pending]}"
    LOG="${S%.py}.log"
    echo "[q2 $p] healthy; running $S (try $((TRIES[pending] + 1)))" >> "$QLOG"
    timeout "${TIMEOUTS[$pending]}" python -u "$S" >> "$LOG" 2>&1
    rc=$?
    echo "[q2 $p] $S exit=$rc" >> "$QLOG"
    TRIES[$pending]=$((TRIES[pending] + 1))
    [ $rc -eq 0 ] && DONE[$pending]=1
  else
    sleep 90
  fi
done
echo "[q2] finished @ $(date +%H:%M:%S)" >> "$QLOG"
