#!/bin/bash
# Sequential CPU suite runner — ONE jax process at a time (box constraint).
# Covers EVERY tests/test_*.py; appends per-file results to SUITE_CPU_r04.txt.
# Default skips @slow tests; SUITE_SLOW=1 includes them.
cd /root/repo
mkdir -p .suite_logs_r04
OUT=SUITE_CPU_r04.txt
: > "$OUT"
MARK="not slow"
if [ -n "$SUITE_SLOW" ]; then MARK=""; fi
for f in tests/test_*.py; do
  name=$(basename "$f" .py)
  start=$(date +%s)
  if [ -n "$MARK" ]; then
    TACHYON_TEST_CPU=1 timeout 2400 python -m pytest "$f" -q -m "$MARK" \
      > ".suite_logs_r04/$name.log" 2>&1
  else
    TACHYON_TEST_CPU=1 timeout 3600 python -m pytest "$f" -q \
      > ".suite_logs_r04/$name.log" 2>&1
  fi
  rc=$?
  end=$(date +%s)
  tailline=$(grep -E "(passed|failed|error|no tests ran)" ".suite_logs_r04/$name.log" | tail -1)
  echo "$f rc=$rc $((end-start))s :: $tailline" >> "$OUT"
done
echo DONE >> "$OUT"
