#!/bin/bash
# Poll for the axon TPU tunnel; when alive, run the round-3 follow-up
# measurements (tools/harvest_r3_followup.sh).
cd "$(dirname "$0")/.."
while true; do
  if timeout 120 python - <<'PY' >/dev/null 2>&1
import jax, numpy as np
x = jax.numpy.ones((8, 128))
v = float(np.asarray((x @ x.T).sum()))
assert v == 1024.0 * 8
PY
  then
    echo "tunnel ALIVE at $(date)" | tee -a HARVEST_R3.txt
    bash tools/harvest_r3_followup.sh
    echo "follow-up harvest done at $(date)" | tee -a HARVEST_R3.txt
    # preserve the measurement artifacts even if the session has ended
    git add HARVEST_R3.txt BENCH_MATRIX.json 2>/dev/null
    git commit -m "Record TPU measurement harvest follow-up (round 3)" \
      -- HARVEST_R3.txt BENCH_MATRIX.json 2>/dev/null
    exit 0
  fi
  echo "tunnel still down at $(date)"
  sleep 240
done
