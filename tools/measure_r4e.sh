#!/bin/bash
# Round-4 queue E: transpose-strategy probe + pre/post stage dissection.
cd "$(dirname "$0")/.."
while pgrep -f "measure_r4d.sh" | grep -v $$ >/dev/null 2>&1; do sleep 60; done
{
  echo "===== transpose probe [$(date +%T)] ====="
  timeout 2500 python -u tools/probe_transpose.py 1280x720 128 24 2>&1 \
    | grep -v WARNING
  echo "===== done E [$(date +%T)] ====="
} > /tmp/measure_r4e.log 2>&1
