#!/bin/bash
# Wait for the in-flight tpu_queue2 run (verify_xbin -> J -> K -> L) to
# exit, then chain session M (spill A/B) plus any entry the first queue
# never completed. Appends to the same scripts/tpu_queue2.log.
set -u
cd /root/repo
PID=$(cat /tmp/tpu_q2.pid 2>/dev/null || echo 0)
while [ "$PID" -gt 0 ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
Q=()
grep -q "verify_xbin.py exit=0" scripts/tpu_queue2.log 2>/dev/null || \
  Q+=("scripts/verify_xbin.py:600")
grep -q "chip_session_r3j.py exit=0" scripts/tpu_queue2.log 2>/dev/null || \
  Q+=("scripts/chip_session_r3j.py:1800")
grep -q "deep10m_r3k.py exit=0" scripts/tpu_queue2.log 2>/dev/null || \
  Q+=("scripts/deep10m_r3k.py:2400")
grep -q "chip_session_r3l.py exit=0" scripts/tpu_queue2.log 2>/dev/null || \
  Q+=("scripts/chip_session_r3l.py:1500")
grep -q "deep10m_r3m.py exit=0" scripts/tpu_queue2.log 2>/dev/null || \
  Q+=("scripts/deep10m_r3m.py:2400")
[ ${#Q[@]} -eq 0 ] && { echo "[qw2] nothing pending"; exit 0; }
exec bash scripts/tpu_queue2.sh "${Q[@]}"
