#!/bin/bash
# TPU work queue after the 2026-08-17 tunnel outage: validation first,
# then the sweeps the outage interrupted, then new recordings.
# Serial — one TPU process at a time. Run from the repo root.
set -xeo pipefail
P=/opt/venv/bin/python

# 0. sanity + end-to-end verify (also records small-batch latency)
timeout 900 $P bench.py --small --latency 2>&1 | tail -8

# 1. GIST1M-class sweep (d=960) — the donation/rebuild fixes target its OOM;
#    memory telemetry prints per add chunk
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --d 960 --n-query 1000 --ks 10 100 --name gist1m_class \
  --n-probes 1 8 32 128 --initial-mult 2 2>&1 | tail -8

# 2. int8 scan-cache sweep (d=128 / 10k queries — shares its GT with the
#    IVFPQR sweep below, NOT with the d=960 gist run; on a fresh /tmp this
#    step pays the one-off 1M x 10k GT compute)
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --cache int8 --name sift1m_int8 --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -6

# 3. IVFPQR rerank sweep (pq64 + r32: 96-byte codes, quality headroom)
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --index ivfpqr --rerank-subvectors 32 --name sift1m_pqr \
  --n-probes 1 8 32 --ks 10 100 2>&1 | tail -6

# 4. int8 flat single-chunk re-measurement (headline candidate)
timeout 900 $P scripts/profile_int8_flat.py 2>&1 | tail -6

# 5. full 1M headline bench to confirm no regression from this session
timeout 1800 $P bench.py 2>&1 | tail -10

# 6. refresh the committed plots
$P benchmark/plot.py
