#!/bin/bash
# Run the round-3 chip sessions sequentially with GENEROUS bounds and no
# aggressive kills: timeout-killing a TPU process mid-dispatch can hold
# the relay grant and re-wedge the tunnel for followers (the Aug-18
# patient-probe experiment). timeout(1) sends SIGTERM (not -9); each
# session also carries internal watchdogs. Resumable: completed sessions
# are recorded in the log and skipped on re-run.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/run_sessions_r3.log
run_one() {
  local entry=$1 budget=$2
  grep -q "SESSION_DONE $entry" "$LOG" 2>/dev/null && return 0
  echo "[runner] starting $entry @ $(date +%H:%M:%S)" >> "$LOG"
  timeout "$budget" python -u "scripts/$entry.py" >> "scripts/$entry.log" 2>&1
  local rc=$?
  echo "[runner] $entry exit=$rc @ $(date +%H:%M:%S)" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "SESSION_DONE $entry" >> "$LOG"
  elif [ $rc -eq 3 ]; then
    # internal watchdog: chip unresponsive — stop cleanly, do not churn
    echo "[runner] chip unresponsive after $entry; stopping" >> "$LOG"
    exit 3
  fi
  # cool-down between sessions (one process at a time, settle the relay)
  sleep 30
}
bench_smoke() {
  # Exercise the driver's own tool end-to-end while the window is healthy
  # (fast smoke; the driver runs the full bench at round end). Runs right
  # after session N so even a short window covers it.
  grep -q "SESSION_DONE bench_smoke" "$LOG" 2>/dev/null && return 0
  echo "[runner] starting bench --smoke @ $(date +%H:%M:%S)" >> "$LOG"
  # int8 Pallas modes join the contest only once session N validated
  # them clean on this hardware (SESSION_DONE = exit 0 = no failures).
  INT8=0
  grep -q "SESSION_DONE chip_session_r3n" "$LOG" 2>/dev/null && INT8=1
  PQVECTOR_BENCH_INT8_PALLAS=$INT8 \
  PQVECTOR_BENCH_MAX_WAIT=600 timeout 1500 python -u bench.py --smoke \
    > scripts/bench_smoke_r3.log 2>&1
  local rc=$?
  echo "[runner] bench_smoke exit=$rc @ $(date +%H:%M:%S)" >> "$LOG"
  [ $rc -eq 0 ] && echo "SESSION_DONE bench_smoke" >> "$LOG"
  sleep 30
}
run_one verify_xbin 1200
run_one chip_session_r3n 2400
bench_smoke
run_one chip_session_r3j 3600
run_one chip_session_r3l 3000
# The 10M sessions need the cached dataset + truth (a fresh VM has
# neither; regenerating costs ~15 min + a 400 s build before any
# measurement). Run them only when the cache is present. Session M
# (spill A/B) is LOW PRIORITY: the residual it targeted was root-caused
# to bf16 storage rounding and fixed by the f32 re-score reference.
if [ -f data/deep10m_96.parquet ]; then
  run_one deep10m_r3k 4800
  run_one deep10m_r3m 4800
else
  echo "[runner] deep10m cache absent; skipping sessions K/M" >> "$LOG"
fi
echo "[runner] all sessions processed @ $(date +%H:%M:%S)" >> "$LOG"
