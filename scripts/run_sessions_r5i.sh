#!/bin/bash
# Follow-up runner: wait for the r5b queue (r5d/r5e + full bench) to
# drain, then run the round-5 validation tail:
#   r5i - reworked cert pass-2 (tile-granular gathers) end-to-end
#   r5j - warm refdefault build with the certified-bf16 AMX host assign
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

run_one() {
  local name="$1" timeout="${2:-2400}"
  echo "[runner-i] $name @ $(date +%H:%M:%S)" >> "$LOG"
  bash scripts/tpu_run.sh "scripts/${name}.py" "$timeout" 20
  echo "[runner-i] $name exit=$? @ $(date +%H:%M:%S)" >> "$LOG"
  sleep 30
}

run_one chip_session_r5i 2400
run_one refdefault_build_r5j 2400
echo "[runner-i] done $(date +%H:%M:%S)" >> "$LOG"
