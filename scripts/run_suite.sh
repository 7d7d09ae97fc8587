#!/bin/bash
# Full-suite sweep, one pytest process per file (the reference's CI runs
# per-target; a fresh process isolates XLA state and caches).  Appends
# one line per file to the log.  Usage:
#   scripts/run_suite.sh [logfile] [timeout_s]
# Env: TACHYON_TEST_CPU=1 to force the cpu platform.
set -u
LOG="${1:-SUITE_LOCAL_r05.txt}"
TMO="${2:-2400}"
cd "$(dirname "$0")/.."
echo "# suite run $(date -u +%FT%TZ) platform=${TACHYON_TEST_CPU:+cpu}${TACHYON_TEST_CPU:-default(TPU)} host=$(nproc)-core" >> "$LOG"
for f in tests/test_*.py; do
  start=$(date +%s)
  out=$(timeout "$TMO" python -m pytest "$f" -q 2>&1 | tail -2 | head -1)
  rc=$?
  dur=$(( $(date +%s) - start ))
  echo "$f rc=$rc ${dur}s :: $out" >> "$LOG"
  echo "$f rc=$rc ${dur}s :: $out"
done
