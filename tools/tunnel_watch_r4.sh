#!/bin/bash
# Round-4 tunnel watcher: probe the axon compile path; when it serves
# again, run the queued batch-stage profile and the b4 bench cell.
cd "$(dirname "$0")/.."
while true; do
  if timeout 150 python - <<'PY' >/dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
import random
n = 8 * random.randint(2, 40)
x = jnp.ones((n, 128 * random.randint(2, 12)), jnp.float32)
v = float(np.asarray(jax.jit(lambda a: (a * 2 + 1).sum())(x)))
assert v > 0
PY
  then
    echo "tunnel compile path ALIVE at $(date)" | tee -a /tmp/r4_watch.log
    timeout 3300 python -u tools/profile_batch_stages.py 4 1280x720 128 12 \
      > /tmp/batchprof3.log 2>&1
    echo "profile rc=$?" >> /tmp/batchprof3.log
    timeout 1700 python bench.py --cell 1280,720,128,sgm,4,24 \
      > /tmp/bench_b4_r4.log 2>&1
    echo "bench rc=$?" >> /tmp/bench_b4_r4.log
    echo "queued measurements done at $(date)" | tee -a /tmp/r4_watch.log
    exit 0
  fi
  echo "tunnel compile path still wedged at $(date)" >> /tmp/r4_watch.log
  sleep 180
done
