#!/bin/bash
# Round-3 follow-up TPU measurements: ONLY the items the first round-3
# window did not capture (the flagship bench, accuracy, profile, sweep and
# TUNED.env are already committed in HARVEST_R3.txt). Appends to
# HARVEST_R3.txt. Run via tools/tunnel_watch.sh when the tunnel returns.
set -u
cd "$(dirname "$0")/.."
LOG=HARVEST_R3.txt
run() {
  echo "===== $* [$(date +%H:%M:%S)] =====" | tee -a "$LOG"
  timeout "$1" "${@:2}" 2>&1 | tee -a "$LOG"
  echo "----- exit=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

# 1. full matrix (BM/SGM x {320x240, 1280x720} x {b1, b4}); per-cell
#    subprocess isolation persists every completed cell immediately
run 7200 env BENCH_MATRIX=1 python bench.py
# 2. BASELINE stretch row: 1080p, 256 disparities
run 3600 python bench.py --cell 1920,1080,256,sgm,1,8
# 3. CLI end-to-end on TPU with the fixed stats semantics (pipelined
#    throughput headline, d2h marked overlap)
run 1800 python -m rt_depth_map_tpu --source synthetic \
  -i /root/reference/backup/1280x720/intrinsics.yml \
  -e /root/reference/backup/1280x720/extrinsics.yml \
  --frames 50 --stats --matcher sgm
# 4. re-confirm the flagship number on the committed tree
run 3600 python bench.py
