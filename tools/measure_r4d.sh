#!/bin/bash
# Round-4 queue D: preload CLI (undonated executable fix), b4 re-measure
# after the 2D histogram + pre-split, then the full headline bench.
cd "$(dirname "$0")/.."
{
  echo "===== CLI --preload (fixed) [$(date +%T)] ====="
  timeout 1700 python -m rt_depth_map_tpu --source synthetic \
    -i /root/reference/backup/1280x720/intrinsics.yml \
    -e /root/reference/backup/1280x720/extrinsics.yml \
    --frames 120 --preload 6 --stats --matcher sgm 2>&1 \
    | grep -v WARNING | tail -12
  echo "===== bench b4 pipelined (post-2Dhist) [$(date +%T)] ====="
  timeout 1700 python bench.py --cell 1280,720,128,sgm,4,24 2>&1 | tail -2
  echo "===== full headline bench [$(date +%T)] ====="
  timeout 3300 python bench.py 2>&1 | tail -3
  echo "===== done D [$(date +%T)] ====="
} > /tmp/measure_r4d.log 2>&1
