#!/bin/bash
# Round-2 recordings, run AFTER record_sweeps4.sh: the code-domain capacity
# path, 4-bit PQ, the spill on/off A/B, compute-only ingest, and the 100M
# single-chip demo. Serial — one TPU process at a time. Run from repo root.
set -xeo pipefail
P=/opt/venv/bin/python

# 1. code-domain (codes-only) sweep at the 1M shape — the decoded-vs-code
#    QPS table for ARCHITECTURE.md; GT shared with the sift1m_int8 sweep
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --cache none --name sift1m_codes --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -6

# 2. 4-bit PQ sweep (PQ64 @ 4 bits = 32 B/code, 16-cluster codebooks)
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-bits 4 --name sift1m_pq4 --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -6

# 3. spill OFF A/B (reference add semantics: every item in its argmax cell;
#    compare against the default bounded-cell sweeps recorded above)
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --no-spill --name sift1m_nospill --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -6

# 4. compute-only ingest: chunks pre-staged in HBM before the timer, so
#    add_s/add_warm_s measure encode+scatter alone (link-vs-framework split)
timeout 2400 $P bench.py --ingest device 2>&1 | tail -8

# 5. 100M x 128d single-chip capacity demo (code-domain index; ~8.6 GB of
#    codes, impossible for any decoded cache on a 16 GB chip)
timeout 10800 $P -u scripts/demo_100m.py 2>&1 \
  | tee benchmark/results/demo_100m_raw.txt | tail -12

# 6. refresh plots with the new JSONs
$P benchmark/plot.py
