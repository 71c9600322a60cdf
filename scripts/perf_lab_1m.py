"""Round-2 perf lab: 1M manifold data, end-to-end search QPS + recall.

Measures, per (impl, compaction, n_probe, k): full index.search wall time
(coarse + probe + scan + translate) and recall@k against host GT. Also the
k_pair recall/speed trade at k=100 and the flat sweep ceiling.
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


def timeit(f, reps=5):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


def recall(pred, gt, k):
    pred = np.asarray(pred)[:, :k]
    return float(np.mean([len(set(pred[i]) & set(gt[i, :k])) / k
                          for i in range(len(pred))]))


def main():
    n, nq, d, n_cells, m = 1_000_000, 10_000, 128, 4096, 64
    base, query = make_data(n, nq, d, spectrum="manifold-12")
    gt = brute_force_topk(base, query, 100, cache_key="full_manifold12")
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n // n_cells) * 2)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    t0 = time.perf_counter()
    index.train(jnp.asarray(base[:100_000]).T)
    for i in range(0, n, 250_000):
        index.add(jnp.asarray(base[i:i + 250_000]).T)
    print(f"build {time.perf_counter() - t0:.0f}s  "
          f"s_max={index.max_cell_capacity}  cap={index.capacity}  "
          f"live_max={int(index._cell_size_np.max())}", flush=True)
    qj = jnp.asarray(query.T)

    index.scan_mode = "cell_major"
    for impl in ("xla", "pallas"):
        index.scan_impl = impl
        for compact in (False, True):
            index.scan_compact = compact
            for n_probe in (1, 8, 32, 128):
                index.n_probe = n_probe
                _, pred = index.search(qj, k=10)
                dt = timeit(lambda: index.search(qj, k=10))
                r = recall(pred, gt, 10)
                print(f"k=10 impl={impl} compact={int(compact)} "
                      f"np={n_probe}: {dt:.1f} ms -> {nq / dt * 1e3:,.0f} "
                      f"q/s recall@10={r:.4f}", flush=True)

    # k=100: the k_pair trade (policy default is max(16, 4*ceil(k/np)))
    index.scan_impl = "pallas"
    index.scan_compact = True
    index.n_probe = 32
    from torchpq_tpu.index.ivfpq import _coarse_probe
    from torchpq_tpu.ops import adc
    dec, nrm, emp, amap, sc, cs_live, sz_live, s_live = \
        index._cell_compacted()
    _, cells, mask = _coarse_probe(
        qj.T, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=32, use_smart=True, precision=None, approx=True)
    for k_pair in (16, 32, 64, 100):
        def f(k_pair=k_pair):
            return adc.scan_cell_major(
                qj.T, cells, mask, dec, nrm, emp, cs_live, sz_live,
                k=100, distance="euclidean", s_max=s_live, n_cells=n_cells,
                approx=True, impl="pallas", k_pair=k_pair)
        v, a = f()
        dt = timeit(f)
        a = np.asarray(a)
        amap_np = np.asarray(amap)
        addr = np.where(a >= 0, amap_np[np.maximum(a, 0)], -1)
        ids = np.asarray(index.get_id_by_address(
            jnp.asarray(np.maximum(addr, 0))))
        ids = np.where(addr >= 0, ids, -1)
        r = float(np.mean([len(set(ids[i]) & set(gt[i])) / 100
                           for i in range(nq)]))
        print(f"k=100 np=32 k_pair={k_pair}: {dt:.1f} ms -> "
              f"{nq / dt * 1e3:,.0f} q/s recall@100={r:.4f}", flush=True)

    # flat ceiling
    index.scan_mode = "flat"
    for k in (10, 100):
        _, pred = index.search(qj, k=k)
        dt = timeit(lambda: index.search(qj, k=k))
        r = recall(pred, gt, k)
        print(f"flat k={k}: {dt:.1f} ms -> {nq / dt * 1e3:,.0f} q/s "
              f"recall@{k}={r:.4f}", flush=True)


if __name__ == "__main__":
    main()
