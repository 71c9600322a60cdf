#!/bin/bash
# Round-2 unified recording queue. Order: GTs on TPU first (skipped when the
# /tmp cache already has them), then the d=128 sweeps that share one
# dataset+GT, then the headline benches, then GIST, then the 100M capacity
# demo. Serial -- ONE TPU process at a time. Run from the repo root.
set -xeo pipefail
# this host faults fresh anonymous pages at ~10 MB/s (reuse: 57 GB/s);
# keep freed arenas mapped so every large buffer faults at most once
export MALLOC_MMAP_MAX_=0 MALLOC_TRIM_THRESHOLD_=1073741824
P=/opt/venv/bin/python

# 0. exact GTs on the MXU (writes the /tmp caches the sweeps + bench read;
#    host BLAS on the single core would take ~25 min per GT)
[ -f /tmp/gt_sweep_synth_d128_manifold-12_euclidean_1000000_10000_100.npy ] \
  || $P scripts/gt_tpu.py --key sweep_synth_d128_manifold-12 \
       --spectrum manifold-12 --k 100 2>&1 | tail -3
[ -f /tmp/gt_full_manifold12_euclidean_1000000_10000_10.npy ] \
  || $P scripts/gt_tpu.py --key full_manifold12 \
       --spectrum manifold-12 --k 10 2>&1 | tail -3

# 1. d=128 1M sweeps -- all share the dataset npz + GT from step 0
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-probes 1 2 4 8 16 32 64 128 --ks 10 100 --name sift1m_class \
  2>&1 | tail -4
# fewer, larger cells: the bookkeeping of the probed scan is ~linear in
# n_pairs, so IVF1024 reaches the same scanned-slot fraction as IVF4096
# with 4x fewer pairs -- the throughput-tuned curve
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-cells 1024 --n-probes 1 2 4 8 16 32 --ks 10 100 \
  --name sift1m_ivf1024 2>&1 | tail -4
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --cache none --name sift1m_codes --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -4
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --cache int8 --name sift1m_int8 --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -4
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --index ivfpqr --rerank-subvectors 32 --name sift1m_pqr \
  --n-probes 1 8 32 --ks 10 100 2>&1 | tail -4
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-bits 4 --name sift1m_pq4 --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -4
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --no-spill --name sift1m_nospill --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -4

# 2. headline bench (+ small-batch latency) and the compute-only ingest A/B
timeout 2700 $P bench.py --latency 2>&1 | tail -10
timeout 2700 $P bench.py --ingest device 2>&1 | tail -8 || echo "INGEST-DEVICE FAILED"

# 3. GIST1M-class (d=960): GT on TPU, then the sweep
[ -f /tmp/gt_sweep_synth_d960_manifold-12_euclidean_1000000_1000_100.npy ] \
  || $P scripts/gt_tpu.py --d 960 --n-query 1000 \
       --key sweep_synth_d960_manifold-12 --spectrum manifold-12 --k 100 \
       2>&1 | tail -3 || echo "GIST GT FAILED"
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --d 960 --n-query 1000 --ks 10 100 --name gist1m_class \
  --n-probes 1 8 32 128 --initial-mult 2 2>&1 | tail -6 \
  || echo "GIST SWEEP FAILED"

# 4. 100M x 128d single-chip capacity demo (code-domain index, on-device
#    data + seed-replay GT -- scripts/demo_100m.py)
timeout 10800 $P -u scripts/demo_100m.py 2>&1 \
  | tee benchmark/results/demo_100m_raw.txt | tail -12 \
  || echo "100M DEMO FAILED"

# 5. refresh the committed plots
$P benchmark/plot.py || true
