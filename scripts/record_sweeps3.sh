#!/bin/bash
# Re-record all recall/QPS sweeps with the current engine (the earlier
# sift1m_class.json predates live-row compaction + the single-chunk flat
# sweep). Serial: one TPU process at a time. GT caches are keyed by dataset
# identity (sweep_synth_d128), so the class/residual runs share
# automatically; the cosine run recomputes for its metric.
set -xeo pipefail
P=/opt/venv/bin/python
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --n-probes 1 2 4 8 16 32 64 128 --name sift1m_class 2>&1 | tail -3
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --residual --name sift1m_residual --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -3
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --distance cosine --name sift1m_cosine --n-probes 1 8 32 128 --ks 10 100 \
  2>&1 | tail -3
env PYTHONUNBUFFERED=1 $P -u benchmark/sweep.py \
  --d 960 --n-query 1000 --ks 10 100 --name gist1m_class \
  --n-probes 1 8 32 128 --initial-mult 2 2>&1 | tail -3
