#!/bin/bash
# serial record sweeps for benchmark/results/
set -x
python -u benchmark/sweep.py --n-probes 1 2 4 8 16 32 64 128 --name sift1m_class 2>&1 | tail -3
python -u benchmark/sweep.py --d 960 --n-query 1000 --ks 10 100 --name gist1m_class --n-probes 1 8 32 128 2>&1 | tail -3
python -u benchmark/sweep.py --distance cosine --name sift1m_cosine --n-probes 1 8 32 128 2>&1 | tail -3
python -u benchmark/sweep.py --residual --name sift1m_residual --n-probes 1 8 32 128 2>&1 | tail -3
