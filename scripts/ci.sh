#!/usr/bin/env bash
# Local CI gate (the reference pins fmt+clippy+test in CI,
# /root/reference/.github/workflows/ci.yml:13-22). Run from the repo root.
set -euo pipefail

echo "== lint (syntax + unused imports) =="
python scripts/lint.py

echo "== compile check =="
python -m compileall -q pqvector_tpu bench.py __graft_entry__.py

echo "== tests (8-device virtual CPU mesh) =="
python -m pytest tests/ -q

echo "== multi-chip dry run =="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

echo "CI gate: OK"
