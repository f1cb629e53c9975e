#!/bin/bash
# Round-4 measurement queue A: b1 + b4-pipelined bench cells (int16
# carries active), then the batch-stage dissection.
cd "$(dirname "$0")/.."
{
  echo "===== bench b1 [$(date +%T)] ====="
  timeout 1700 python bench.py --cell 1280,720,128,sgm,1,24 2>&1 | tail -3
  echo "===== bench b4 pipelined [$(date +%T)] ====="
  timeout 1700 python bench.py --cell 1280,720,128,sgm,4,24 2>&1 | tail -3
  echo "===== batch-stage profile [$(date +%T)] ====="
  timeout 3300 python -u tools/profile_batch_stages.py 4 1280x720 128 12 2>&1 \
    | grep -v WARNING
  echo "===== done [$(date +%T)] ====="
} > /tmp/measure_r4a.log 2>&1
