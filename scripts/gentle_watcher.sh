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
    src=$?
    echo "[gw] session runner exit=$src @ $(date +%H:%M:%S)" >> "$LOG"
    # rc=3 = chip wedged mid-queue; the runner is resumable (SESSION_DONE
    # markers), so fall back into the probe loop instead of abandoning
    # the remaining sessions.
    [ $src -eq 0 ] && exit 0
  fi
  sleep 600
done
echo "[gw] gave up @ $(date +%H:%M:%S)" >> "$LOG"
