"""Tune the synthetic generator so the recall-vs-n_probe axis matches
SIFT1M's shape (0.43 / 0.80 / 0.95 / 0.995 at n_probe 1/8/32/128).

Builds small IVF indexes on candidate generator settings and prints the
probing curve; run on TPU (fast builds) with host-side GT.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_data, brute_force_topk
from torchpq_tpu.index import IVFPQIndex


def curve(spectrum, n=200_000, nq=2000, d=128, n_cells=1024, m=64):
    base, query = make_data(n, nq, d, cache=False, spectrum=spectrum)
    gt = brute_force_topk(base, query, 10)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n // n_cells) * 2)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    t0 = time.perf_counter()
    index.train(jnp.asarray(base[:100_000]).T)
    for i in range(0, n, 250_000):
        index.add(jnp.asarray(base[i:i + 250_000]).T)
    build = time.perf_counter() - t0
    qj = jnp.asarray(query.T)
    out = {}
    index.scan_mode = "cell_major"
    for np_ in (1, 2, 4, 8, 16, 32, 64, 128):
        index.n_probe = np_
        _, pred = index.search(qj, k=10)
        pred = np.asarray(pred)
        rec = np.mean([len(set(pred[i]) & set(gt[i])) / 10
                       for i in range(nq)])
        out[np_] = round(float(rec), 4)
    index.scan_mode = "flat"
    _, pred = index.search(qj, k=10)
    pred = np.asarray(pred)
    out["flat"] = round(float(np.mean(
        [len(set(pred[i]) & set(gt[i])) / 10 for i in range(nq)])), 4)
    print(f"{spectrum}: build {build:.0f}s  {out}", flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:] or ["manifold-12", "manifold-16", "manifold-24",
                                 "flat"]:
        curve(spec)
