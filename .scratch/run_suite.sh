#!/bin/bash
# Full suite, per-file, with timeouts. Default platform (TPU via tunnel when up).
cd /root/repo
OUT=SUITE_r04.txt
: > $OUT
echo "# Full suite run, round 4 ($(date -u +%FT%TZ)), platform=default(TPU v5e tunnel), 1-core host" >> $OUT
for f in tests/test_*.py; do
  s=$(date +%s)
  timeout 1800 python -m pytest "$f" -q --no-header -p no:cacheprovider > /tmp/suite_one.log 2>&1
  rc=$?
  e=$(date +%s)
  tail1=$(grep -E "passed|failed|error|skipped" /tmp/suite_one.log | tail -1)
  echo "$f rc=$rc ${b:-}$((e-s))s :: $tail1" >> $OUT
done
echo "# done $(date -u +%FT%TZ)" >> $OUT
