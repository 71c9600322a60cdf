#!/bin/bash
# Round-4 TPU recording queue. Serial — ONE TPU process at a time.
# Order: stale-claim guard, GT caches, the three d=128 1M sweeps on the new
# scan paths (codes tier now runs the fused Pallas codes kernel; int8 rows
# now hit the kernel's int8 mode; the class sweep re-records with per-row
# scan_gate and the k_pair<=64 gate-stability fix), then the 50M and 100M
# single-chip serving demos on the packed-at-ingest storage (VERDICT r3 #1:
# the only capability claim that has never executed). Run from the repo root.
set -xo pipefail
export MALLOC_MMAP_MAX_=0 MALLOC_TRIM_THRESHOLD_=1073741824
P=/opt/venv/bin/python

# 0. stale-TPU-claim guard (VERDICT r3: the round-3 50M rerun died because a
#    dead probe client's HBM was never released). Wait out other local python
#    processes, then loop a tiny allocation probe until the chip actually
#    grants a claim with a clean HBM arena — claim recovery after a killed
#    process takes 1-2 min and surfaces as RESOURCE_EXHAUSTED/unavailable.
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

# 1. GT caches (fresh /tmp each round). MXU exact top-k; host BLAS on the
#    single core would take ~25 min per GT.
[ -f /tmp/gt_sweep_synth_d128_manifold-12_euclidean_1000000_10000_100.npy ] \
  || $P scripts/gt_tpu.py --key sweep_synth_d128_manifold-12 \
       --spectrum manifold-12 --k 100 2>&1 | tail -3
[ -f /tmp/gt_full_manifold12_euclidean_1000000_10000_10.npy ] \
  || $P scripts/gt_tpu.py --key full_manifold12 \
       --spectrum manifold-12 --k 10 2>&1 | tail -3

# 2. codes tier on the Pallas kernel (r3 recorded 1.7-5.6k q/s on the
#    one-hot path; target >= 35k at np=32 k=10)
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --cache none --name sift1m_codes_r4 --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -4

# 3. int8 tier re-record on the kernel's int8 mode (r3's file predates it)
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --cache int8 --name sift1m_int8_r4 --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -4

# 4. class sweep re-record: per-row scan_gate + the k_pair ceiling that
#    pins the impl across the whole n_probe axis (r3's np=4 k=100 anomaly)
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-probes 1 2 4 8 16 32 64 128 --ks 10 100 --name sift1m_class_r4 \
  2>&1 | tail -4

# 5. 50M then 100M single-chip serving demos on packed-at-ingest storage
timeout 7200 env PYTHONUNBUFFERED=1 $P -u scripts/demo_100m.py \
  --n 50000000 --out demo_50m.json 2>&1 | tail -25 || echo "50M FAILED"
timeout 10800 env PYTHONUNBUFFERED=1 $P -u scripts/demo_100m.py \
  --n 100000000 --out demo_100m.json 2>&1 | tail -25 || echo "100M FAILED"

echo "QUEUE r4a DONE"
