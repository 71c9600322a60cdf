#!/bin/bash
# Round-4 queue D: deep-k endgame. The r4b grid (initial_mult=3) showed
# cap alone is not recall-neutral at k=100 but k_pair=32 is a ~30% lever;
# r3's initial_mult=2 windows are another ~19%. This queue measures the
# mult2 grid, then records the two headline class curves at mult2: the
# plain recall-parity g4 curve (per-row gates, k_pair auto) and the
# deep-k-tuned curve (k_pair=32), plus the deep-k stage budget profile.
# Run from the repo root.
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

# 1. mult2 deep-k grid (uncapped k_pair ladder + trimmed cap ladder)
timeout 5400 env PYTHONUNBUFFERED=1 $P -u scripts/deepk_parity.py \
  --initial-mult 2 --tag r4m2 2>&1 | tail -30 || echo "M2 GRID FAILED"

# 2. class curve at mult2 (the r3 headline config) with per-row gates
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-probes 1 2 4 8 16 32 64 128 --ks 10 100 --name sift1m_class_r4m2 \
  --initial-mult 2 2>&1 | tail -4 || echo "CLASS M2 FAILED"

# 3. deep-k-tuned curve: k_pair=32 (measure the whole frontier with its
#    recall deltas; README presents it next to the parity curve)
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-probes 8 16 32 64 128 --ks 100 --name sift1m_deepk_kp32 \
  --initial-mult 2 --k-pair 32 --skip-flat 2>&1 | tail -4 \
  || echo "KP32 CURVE FAILED"

# 4. deep-k stage budget (scan impl x group x cap + merge A/B)
timeout 3600 env PYTHONUNBUFFERED=1 $P -u scripts/profile_deepk.py \
  2>&1 | tail -30 || echo "DEEPK PROFILE FAILED"

echo "QUEUE r4d DONE"
