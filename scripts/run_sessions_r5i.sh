#!/bin/bash
# Follow-up runner: wait for the r5b queue (r5c/r5d/r5e + full bench) to
# drain, then run the reworked-cert validation session r5i.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/run_sessions_r5i.log
echo "[runner-i] start $(date +%H:%M:%S)" >> "$LOG"

# Wait (up to ~3.5h) for the r5b runner's "done" marker.
for i in $(seq 1 420); do
  if tail -5 scripts/run_sessions_r5b.log | grep -q "\[runner\] done"; then
    echo "[runner-i] r5b drained @ $(date +%H:%M:%S)" >> "$LOG"
    break
  fi
  sleep 30
done
if ! tail -5 scripts/run_sessions_r5b.log | grep -q "\[runner\] done"; then
  echo "[runner-i] r5b never drained; aborting @ $(date +%H:%M:%S)" >> "$LOG"
  exit 1
fi
sleep 30  # relay settle

echo "[runner-i] chip_session_r5i @ $(date +%H:%M:%S)" >> "$LOG"
bash scripts/tpu_run.sh scripts/chip_session_r5i.py 2400 20
echo "[runner-i] chip_session_r5i exit=$? @ $(date +%H:%M:%S)" >> "$LOG"
echo "[runner-i] done $(date +%H:%M:%S)" >> "$LOG"
