#!/bin/bash
# Round-4 queue G: wait for the compile helper, then final headline bench
# with the updated TUNED.env (VBIDIR_KB=4).
cd "$(dirname "$0")/.."
while true; do
  if timeout 150 python - <<'PY' >/dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
import random
n = 8 * random.randint(3, 50)
x = jnp.ones((n, 128 * random.randint(2, 11)), jnp.float32)
assert float(np.asarray(jax.jit(lambda a: (a * 2 + 1).sum())(x))) > 0
PY
  then
    echo "helper ALIVE at $(date)" >> /tmp/r4g.log
    timeout 3300 python bench.py > /tmp/bench_final_r4.log 2>&1
    echo "bench rc=$?" >> /tmp/bench_final_r4.log
    exit 0
  fi
  echo "helper wedged at $(date)" >> /tmp/r4g.log
  sleep 150
done
