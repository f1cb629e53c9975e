#!/bin/bash
# Round-4 queue B: host-ingest CLI demo, on-device mode accuracy rows,
# stretch-cell regression check. Waits for queue A to finish.
cd "$(dirname "$0")/.."
while pgrep -f "measure_r4a.sh" | grep -v $$ >/dev/null 2>&1; do sleep 60; done
{
  echo "===== CLI host-ingest (prefetch+ring) [$(date +%T)] ====="
  timeout 1700 python -m rt_depth_map_tpu --source synthetic \
    -i /root/reference/backup/1280x720/intrinsics.yml \
    -e /root/reference/backup/1280x720/extrinsics.yml \
    --frames 120 --stats --matcher sgm 2>&1 | grep -v WARNING | tail -14
  echo "===== accuracy --device --modes [$(date +%T)] ====="
  timeout 3300 python tools/accuracy_report.py 2 --device --modes 2>&1 \
    | grep -v WARNING | tail -22
  echo "===== stretch cell regression [$(date +%T)] ====="
  timeout 1700 python bench.py --cell 1920,1080,256,sgm,1,8 2>&1 | tail -2
  echo "===== done B [$(date +%T)] ====="
} > /tmp/measure_r4b.log 2>&1
