#!/bin/bash
# Warm ONE bench point into the persistent compile cache, retrying (compiles
# resume from cached sub-executables across attempts). Usage:
#   bash probes/warm_point.sh <spec> [attempts] [per_attempt_timeout_s]
# Succeeds (rc 0) as soon as an attempt prints an img_per_s JSON line.
spec="$1"; attempts="${2:-3}"; budget="${3:-880}"
cd /root/repo
for i in $(seq 1 "$attempts"); do
  echo "=== $spec attempt $i $(date +%T) ==="
  out=$(timeout "$budget" python bench.py --point "$spec" 2>&1 | tail -4)
  echo "$out"
  if echo "$out" | grep -q img_per_s; then
    echo "=== $spec WARM $(date +%T) ==="
    exit 0
  fi
done
echo "=== $spec FAILED after $attempts attempts $(date +%T) ==="
exit 1
