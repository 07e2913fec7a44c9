#!/bin/bash
# Warm the persistent compile cache (.jax_cache) for every standing bench
# point, one fresh process per point (same isolation as bench.py's sweep).
# Run before the driver's end-of-round bench so every point restores warm.
cd /root/repo
for spec in \
    "detect:res50_coco:544:16" \
    "detect:swin_tiny_coco:544:16" \
    "detect:res101_coco:544:16" \
    "train:res50_coco:544:8" \
    "detect:swin_tiny_coco:256:8"; do
  echo "=== warming $spec $(date +%T) ==="
  timeout 900 python bench.py --point "$spec" 2>&1 | tail -3
  echo "=== rc=$? done $spec $(date +%T) ==="
done
echo "ALL_WARM_DONE"
