"""Search micro-profiling on the real chip: exact vs approx top-k, fused
search, batch-size scaling."""

import faulthandler
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_data, brute_force_topk, recall_at_k
from torchpq_tpu.index import IVFPQIndex


def timeit(f, reps=5):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    n_base, d, n_cells, m = 100_000, 64, 512, 32
    base, query = make_data(n_base, 10_000, d)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 2)
    t0 = time.perf_counter()
    index.train(jnp.asarray(base[:50_000].T))
    index.add(jnp.asarray(base.T))
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    true10 = brute_force_topk(base, query[:2000], 10)
    ids_map = np.arange(n_base)

    index.n_probe = 32
    for approx in (False, True):
        index.use_approx_topk = approx
        for nq in (1000, 10_000):
            qj = jnp.asarray(query[:nq].T)
            dt = timeit(lambda: index.search(qj, k=10))
            vals, pred = index.search(jnp.asarray(query[:2000].T), k=10)
            rec = recall_at_k(np.asarray(pred), true10, ids_map, 10)
            print(f"approx={approx} nq={nq}: {dt * 1e3:.2f} ms "
                  f"-> {nq / dt:,.0f} q/s  recall@10={rec:.4f}", flush=True)

    # full probe ceiling
    index.n_probe = n_cells
    index.use_approx_topk = False
    vals, pred = index.search(jnp.asarray(query[:2000].T), k=10)
    rec = recall_at_k(np.asarray(pred), true10, ids_map, 10)
    print(f"ADC ceiling (full probe, exact): recall@10={rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
