#!/bin/bash
# Round-4 queue E: the GIST d=960 stage breakdown (locate the probed-scan
# bottleneck the int8 sweep exposed). Run from the repo root.
set -xo pipefail
export MALLOC_MMAP_MAX_=0 MALLOC_TRIM_THRESHOLD_=1073741824
P=/opt/venv/bin/python
for i in $(seq 1 30); do
  others=$(ps -eo pid,comm | awk '$2=="python"' | grep -v "^ *$$" | wc -l)
  [ "$others" -eq 0 ] && break
  echo "[guard] waiting ($i/30)"; sleep 30
done
for i in $(seq 1 20); do
  if timeout 180 $P - <<'PYEOF'
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((256,256), jnp.bfloat16) @ jnp.ones((256,256), jnp.bfloat16))
print("claim ok")
PYEOF
  then break; fi
  echo "[guard] retry ($i/20)"; sleep 60
done
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-probes 128 --ks 100 --name sift1m_deepk_kp32cap64 --initial-mult 2 \
  --k-pair 32 --probe-cap 64 --skip-flat 2>&1 | tail -3 \
  || echo "KP32CAP64 FAILED"
timeout 5400 env PYTHONUNBUFFERED=1 $P -u scripts/probe_100m_search.py \
  2>&1 | tail -10 || echo "100M PROBE FAILED"
timeout 3600 env PYTHONUNBUFFERED=1 $P -u scripts/profile_gist_stages.py \
  2>&1 | tail -40 || echo "GIST PROFILE FAILED"
echo "QUEUE r4e DONE"
