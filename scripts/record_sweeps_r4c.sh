#!/bin/bash
# Round-4 queue C: the 50M and 100M single-chip serving demos on the fixed
# pair-RMW packed ingest (the r4a attempts died on the element-scatter's
# 32 GB padded index tensor), plus a codes-sweep re-record for honest
# add_s on the fixed write path. Run from the repo root.
set -xo pipefail
export MALLOC_MMAP_MAX_=0 MALLOC_TRIM_THRESHOLD_=1073741824
P=/opt/venv/bin/python

for i in $(seq 1 30); do
  others=$(ps -eo pid,comm | awk '$2=="python"' | grep -v "^ *$$" | wc -l)
  [ "$others" -eq 0 ] && break
  echo "[guard] $others python process(es) alive; waiting ($i/30)"; sleep 30
done
for i in $(seq 1 20); do
  if timeout 180 $P - <<'PYEOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
jax.block_until_ready(x @ x)
print("claim ok:", jax.devices())
PYEOF
  then break; fi
  echo "[guard] claim probe failed; retrying ($i/20)"; sleep 60
done

timeout 7200 env PYTHONUNBUFFERED=1 $P -u scripts/demo_100m.py \
  --n 50000000 --out demo_50m.json 2>&1 | tail -30 || echo "50M FAILED"
timeout 10800 env PYTHONUNBUFFERED=1 $P -u scripts/demo_100m.py \
  --n 100000000 --out demo_100m.json 2>&1 | tail -30 || echo "100M FAILED"
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --cache none --name sift1m_codes_r4 --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -4 || echo "CODES RE-RECORD FAILED"
echo "QUEUE r4c DONE"
