#!/bin/bash
# Round-4 queue F: validate the pad-fit path on hardware -- accuracy at
# the width-scaled D=192 cells (now riding padded Pallas kernels) and the
# CLI preload rate at the calibration ROI.
cd "$(dirname "$0")/.."
while pgrep -f "measure_r4[de].sh" | grep -v $$ >/dev/null 2>&1; do sleep 60; done
{
  echo "===== accuracy --device (pad-fit pallas at D=192) [$(date +%T)] ====="
  timeout 3300 python tools/accuracy_report.py 2 --device 2>&1 \
    | grep -v WARNING | tail -12
  echo "===== CLI --preload at calibration ROI (pad-fit) [$(date +%T)] ====="
  timeout 1700 python -m rt_depth_map_tpu --source synthetic \
    -i /root/reference/backup/1280x720/intrinsics.yml \
    -e /root/reference/backup/1280x720/extrinsics.yml \
    --frames 120 --preload 6 --stats --matcher sgm 2>&1 \
    | grep -v WARNING | tail -12
  echo "===== done F [$(date +%T)] ====="
} > /tmp/measure_r4f.log 2>&1
