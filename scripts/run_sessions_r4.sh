#!/bin/bash
# Round-4 sequential chip runner: DEEP-10M cache prep, the K/M validation
# sessions (VERDICT r4 item 3), then a full driver-style bench.
# Sessions run strictly one at a time through tpu_run.sh's health gate.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/run_sessions_r4.log
echo "[runner] start $(date +%H:%M:%S)" >> "$LOG"

run_one() {
  local name="$1" timeout="${2:-2400}"
  echo "[runner] $name @ $(date +%H:%M:%S)" >> "$LOG"
  bash scripts/tpu_run.sh "scripts/${name}.py" "$timeout" 20
  echo "[runner] $name exit=$? @ $(date +%H:%M:%S)" >> "$LOG"
  sleep 30  # let the relay settle between sessions
}

if [ -f data/refdefault_1m_1024.parquet ]; then
  run_one refdefault_build_r4 2400
else
  echo "[runner] refdefault cache absent; skipping build session" >> "$LOG"
fi

run_one deep10m_prep 2400
if [ -f data/deep10m_96.parquet ]; then
  run_one deep10m_r4a 2400
  run_one deep10m_r3m 2400
else
  echo "[runner] deep10m cache absent; skipping K/M" >> "$LOG"
fi

echo "[runner] bench @ $(date +%H:%M:%S)" >> "$LOG"
timeout 2400 python -u bench.py > scripts/bench_r4_validation.log 2>&1
echo "[runner] bench exit=$? @ $(date +%H:%M:%S)" >> "$LOG"
echo "[runner] done $(date +%H:%M:%S)" >> "$LOG"
