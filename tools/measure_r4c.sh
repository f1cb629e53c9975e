#!/bin/bash
# Round-4 queue C: preload CLI rate, int16 A/B, b1 bench with the
# column-banded speckle histogram. Waits for queue B.
cd "$(dirname "$0")/.."
while pgrep -f "measure_r4b.sh" | grep -v $$ >/dev/null 2>&1; do sleep 60; done
{
  echo "===== CLI --preload (device-resident ring) [$(date +%T)] ====="
  timeout 1700 python -m rt_depth_map_tpu --source synthetic \
    -i /root/reference/backup/1280x720/intrinsics.yml \
    -e /root/reference/backup/1280x720/extrinsics.yml \
    --frames 120 --preload 6 --stats --matcher sgm 2>&1 \
    | grep -v WARNING | tail -12
  echo "===== probe int16 carries [$(date +%T)] ====="
  timeout 2500 python -u tools/probe_int16.py 1280x720 128 16 2>&1 \
    | grep -v WARNING
  echo "===== bench b1 (2D-banded speckle hist) [$(date +%T)] ====="
  timeout 1700 python bench.py --cell 1280,720,128,sgm,1,24 2>&1 | tail -2
  echo "===== done C [$(date +%T)] ====="
} > /tmp/measure_r4c.log 2>&1
