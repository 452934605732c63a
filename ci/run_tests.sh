#!/usr/bin/env bash
# Fast/full test split, mirroring the reference's CI layout
# (/root/reference/ci_scripts/run_tests.sh: full BNN end-to-end tests run
# only in the daily cron, the fast suite on every push).
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-fast}"

if [ "$MODE" = "full" ]; then
    python -m pytest tests/ -q
else
    python -m pytest tests/ -q --ignore=tests/models
fi
