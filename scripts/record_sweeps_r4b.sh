#!/bin/bash
# Round-4 follow-up TPU queue (chained after record_sweeps_r4.sh):
# deep-k recall/QPS tuning grid, GIST d=960 on the int8 Pallas scan
# (VERDICT r3 #2), cold-build attribution (#8), and the headline bench
# refresh. Serial — ONE TPU process at a time. Run from the repo root.
set -xo pipefail
export MALLOC_MMAP_MAX_=0 MALLOC_TRIM_THRESHOLD_=1073741824
P=/opt/venv/bin/python

# stale-claim guard (same as record_sweeps_r4.sh)
for i in $(seq 1 30); do
  others=$(ps -eo pid,comm | awk '$2=="python"' | grep -v "^ *$$" | wc -l)
  [ "$others" -eq 0 ] && break
  echo "[guard] $others python process(es) alive; waiting ($i/30)"; sleep 30
done
for i in $(seq 1 20); do
  if timeout 180 $P - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
jax.block_until_ready(x @ x)
print("claim ok:", jax.devices())
EOF
  then break; fi
  echo "[guard] claim probe failed; retrying ($i/20)"; sleep 60
done

# 1. deep-k parity grid (1M class shape, recall@100 per (group,cap,k_pair))
timeout 5400 env PYTHONUNBUFFERED=1 $P -u scripts/deepk_parity.py \
  2>&1 | tail -40 || echo "DEEPK GRID FAILED"

# 2. GIST d=960: GT then the int8-cache sweep on the Pallas int8 window
[ -f /tmp/gt_sweep_synth_d960_manifold-12_euclidean_1000000_1000_100.npy ] \
  || $P scripts/gt_tpu.py --d 960 --n-query 1000 \
       --key sweep_synth_d960_manifold-12 --spectrum manifold-12 --k 100 \
       2>&1 | tail -3 || echo "GIST GT FAILED"
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --d 960 --n-query 1000 --ks 10 100 --name gist1m_int8_r4 \
  --cache int8 --n-probes 1 8 32 128 --initial-mult 2 2>&1 | tail -6 \
  || echo "GIST INT8 SWEEP FAILED"

# 3. cold-build attribution at the GIST shape: true cold (cache off),
#    then the same-machine warm path (cache on)
timeout 3600 env PYTHONUNBUFFERED=1 $P -u scripts/profile_cold_build.py \
  --cache off 2>&1 | tail -30 > /tmp/cold_build_off.log \
  || echo "COLD BUILD (off) FAILED"
tail -3 /tmp/cold_build_off.log
timeout 3600 env PYTHONUNBUFFERED=1 $P -u scripts/profile_cold_build.py \
  --cache on 2>&1 | tail -5 || echo "COLD BUILD (on) FAILED"

# 4. headline bench refresh (+ latency points) for the round artifact
timeout 2700 $P bench.py --latency 2>&1 | tail -10 || echo "BENCH FAILED"

echo "QUEUE r4b DONE"
