#!/bin/bash
# Round-4 queue F: final re-records on the width-gated merge (the kp32
# deep-k curve + the np=64 target point were recorded on the slower
# bitonic-everywhere merge), then the headline bench for the round
# artifact. Run from the repo root.
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
  --n-probes 8 16 32 64 128 --ks 100 --name sift1m_deepk_kp32 \
  --initial-mult 2 --k-pair 32 --skip-flat 2>&1 | tail -3 \
  || echo "KP32 RE-RECORD FAILED"
timeout 2700 $P bench.py 2>&1 | tail -6 || echo "BENCH FAILED"
echo "QUEUE r4f DONE"
