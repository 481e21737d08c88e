#!/bin/bash
# Round-5 recovery runner: the tunnel died at 00:11 mid-r5f; this queue
# finishes the round-5 VERDICT items once a healthy window returns.
#   r5g  - rebuilt mode="cert" end-to-end QPS (item 5 completion)
#   r5h  - warm refdefault build with the fault-aware decode (item 6)
#   r5c  - 12M spilled serving WITH re-score, AOT + same-config recall (item 2)
#   r5d  - BASELINE config 6 (1M x 1024, K=100, NPROBE=16) (item 4)
#   r5e  - BASELINE config 3 (GloVe-shaped cosine) (item 4)
#   bench.py full - driver-shape validation (items 1/3/7)
# Sessions run strictly one at a time through tpu_run.sh's health gate.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/run_sessions_r5b.log
echo "[runner] start $(date +%H:%M:%S)" >> "$LOG"

# Wait (up to ~8h) for the first healthy window before starting the queue:
# tpu_run's own 30-retry budget is for mid-queue flakiness, not a
# multi-hour outage.
for i in $(seq 1 160); do
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((8,128))+1); print('healthy')" > /tmp/r5b_gate 2>&1
  if grep -q healthy /tmp/r5b_gate; then
    echo "[runner] gate healthy after $i probes @ $(date +%H:%M:%S)" >> "$LOG"
    break
  fi
  sleep 180
done
if ! grep -q healthy /tmp/r5b_gate; then
  echo "[runner] gate never went healthy; aborting @ $(date +%H:%M:%S)" >> "$LOG"
  exit 1
fi

run_one() {
  local name="$1" timeout="${2:-2400}"
  echo "[runner] $name @ $(date +%H:%M:%S)" >> "$LOG"
  bash scripts/tpu_run.sh "scripts/${name}.py" "$timeout" 20
  echo "[runner] $name exit=$? @ $(date +%H:%M:%S)" >> "$LOG"
  sleep 30  # let the relay settle between sessions
}

run_one chip_session_r5g 2400
run_one refdefault_build_r5h 2400
run_one chip_session_r5c 3000
run_one chip_session_r5d 3000
run_one chip_session_r5e 3000

echo "[runner] bench @ $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python -u bench.py > scripts/bench_r5_validation.log 2>&1
echo "[runner] bench exit=$? @ $(date +%H:%M:%S)" >> "$LOG"
echo "[runner] done $(date +%H:%M:%S)" >> "$LOG"
