#!/bin/bash
# Wait for the in-flight tpu_run (session J) to exit, then chain the rest
# of the round-3 chip queue: J (if it never completed), K, L.
set -u
cd /root/repo
PID=$(cat /tmp/tpu_run.pid 2>/dev/null || echo 0)
while [ "$PID" -gt 0 ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
Q=()
grep -q "session complete" scripts/chip_session_r3j.log 2>/dev/null || \
  Q+=("scripts/chip_session_r3j.py:1800")
Q+=("scripts/deep10m_r3k.py:2400" "scripts/chip_session_r3l.py:1500")
bash scripts/tpu_queue.sh "${Q[@]}"
