"""Sweep scan_cell_major knobs on the real chip."""

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

from bench import make_data
from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.index.ivfpq import _coarse_probe
from torchpq_tpu.ops import adc


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
                       initial_size=(n_base // n_cells) * 4)
    t0 = time.perf_counter()
    index.train(jnp.asarray(base[:50_000].T))
    index.add(jnp.asarray(base.T))
    print(f"build: {time.perf_counter() - t0:.1f}s  "
          f"s_max={index.max_cell_capacity}  "
          f"mean_cell={float(np.asarray(index._cell_size).mean()):.0f}  "
          f"max_cell={int(np.asarray(index._cell_size).max())}", flush=True)

    nq = 10_000
    q = jnp.asarray(query[:nq])
    cb = index.vq_codec.kmeans._centroids[0]
    _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0), n_probe=32,
                                   use_smart=True, precision=None,
                                   approx=True)
    jax.block_until_ready(cells)
    dt = timeit(lambda: _coarse_probe(q, cb, jnp.float32(30.0), n_probe=32,
                                      use_smart=True, precision=None,
                                      approx=True))
    print(f"coarse probe: {dt * 1e3:.2f} ms", flush=True)

    args = (q, cells, mask, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity)
    kw = dict(k=10, distance="euclidean", s_max=index.max_cell_capacity,
              n_cells=n_cells, approx=True)
    for bc in (8, 32, 128):
        for pt in (128, 256):
            try:
                f = lambda: adc.scan_cell_major(*args, p_tile=pt,
                                                block_chunk=bc, **kw)
                dt = timeit(f)
                print(f"cell_major block_chunk={bc} p_tile={pt}: "
                      f"{dt * 1e3:.2f} ms -> {nq / dt:,.0f} q/s", flush=True)
            except Exception as e:
                print(f"bc={bc} pt={pt} failed: {type(e).__name__} {e}",
                      flush=True)


if __name__ == "__main__":
    main()
