#!/bin/bash
set -x
python -u benchmark/sweep.py --d 960 --n-query 1000 --ks 10 100 --name gist1m_class --n-probes 1 8 32 128 --initial-mult 2 2>&1 | tail -2
python -u benchmark/sweep.py --distance cosine --name sift1m_cosine --n-probes 1 8 32 128 --ks 10 2>&1 | tail -2
python -u benchmark/sweep.py --residual --name sift1m_residual --n-probes 1 8 32 128 --ks 10 2>&1 | tail -2
