#!/bin/bash
# Gentle chip watcher: run the patient probe (never killed externally; it
# exits on its own with UNAVAILABLE during outages — observed ~25-30 min
# to surface), and when a probe succeeds, run the session queue. No
# 3-minute kill loops (see patient_probe.py's rationale).
set -u
cd "$(dirname "$0")/.."
LOG=scripts/gentle_watcher.log
for i in $(seq 1 40); do
  echo "[gw $i] probe @ $(date +%H:%M:%S)" >> "$LOG"
  python -u scripts/patient_probe.py > scripts/patient_probe.log 2>&1 &
  echo $! > /tmp/gw_probe.pid
  wait $!
  rc=$?
  echo "[gw $i] probe exit=$rc @ $(date +%H:%M:%S)" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "[gw] chip responsive; running sessions" >> "$LOG"
    bash scripts/run_sessions_r3.sh
    echo "[gw] session runner finished @ $(date +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  sleep 600
done
echo "[gw] gave up @ $(date +%H:%M:%S)" >> "$LOG"
