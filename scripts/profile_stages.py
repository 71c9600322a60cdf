"""Stage-level profiling of train/add/search on the real chip."""

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
from torchpq_tpu.index.ivfpq import _coarse_probe


def t(label, t0):
    jax.effects_barrier()
    now = time.perf_counter()
    print(f"  {label}: {(now - t0) * 1e3:.1f} ms", flush=True)
    return now


def main():
    n_base, n_query, d, n_cells, m = 100_000, 1000, 64, 512, 32
    base, query = make_data(n_base, n_query, d)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 2)

    t0 = time.perf_counter()
    index.train(jnp.asarray(base[:50_000].T))
    t0 = t("train", t0)

    # ---- add stages, manually unrolled ----
    x = jnp.asarray(base.T)
    t0 = t("h2d base", t0)
    cells = index.vq_codec.encode(x)
    jax.block_until_ready(cells)
    t0 = t("coarse assign", t0)
    codes_nm = index.pq_codec.encode_nd(x.T)
    jax.block_until_ready(codes_nm)
    t0 = t("pq encode", t0)
    decoded = index.pq_codec.decode_nd(codes_nm)
    jax.block_until_ready(decoded)
    t0 = t("pq decode", t0)
    norms = jnp.sum(jnp.square(decoded), axis=-1, keepdims=True)
    from torchpq_tpu.container.cell import CellContainer
    CellContainer.add(index, codes_nm.T, cells, aux_rows={
        "decoded": decoded, "norm": norms})
    t0 = t("container add", t0)
    # second add round into a fresh index would need expansion; re-time cached:
    index.empty()
    t0 = t("empty", t0)
    CellContainer.add(index, codes_nm.T, cells, aux_rows={
        "decoded": decoded, "norm": norms})
    t0 = t("container add (cached)", t0)

    # ---- search stages ----
    q = jnp.asarray(query)  # [nq, d]
    for n_probe in (32,):
        cb = index.vq_codec.kmeans._centroids[0]
        out = _coarse_probe(q, cb, jnp.float32(30.0), n_probe=n_probe,
                            use_smart=False, precision=None)
        jax.block_until_ready(out)
        t0 = t(f"coarse probe compile np={n_probe}", t0)
        for _ in range(3):
            out = _coarse_probe(q, cb, jnp.float32(30.0), n_probe=n_probe,
                                use_smart=False, precision=None)
            jax.block_until_ready(out)
        t0 = t("coarse probe x3 (cached)", t0)
        _, cellsq, mask = out
        from torchpq_tpu.ops import adc
        args = (q, cellsq, mask, index.aux("decoded"),
                index.aux("norm")[:, 0], index._is_empty, index._cell_start,
                index._cell_capacity)
        kw = dict(k=10, distance="euclidean", s_max=index.max_cell_capacity)
        v, a = adc.scan_cell_major(*args, n_cells=n_cells, **kw)
        jax.block_until_ready(v)
        t0 = t("cell_major compile", t0)
        for _ in range(3):
            v, a = adc.scan_cell_major(*args, n_cells=n_cells, **kw)
            jax.block_until_ready(v)
        t0 = t("cell_major x3 (cached)", t0)
        v2, a2 = adc.scan_query_major(*args, **kw)
        jax.block_until_ready(v2)
        t0 = t("query_major compile", t0)
        for _ in range(3):
            v2, a2 = adc.scan_query_major(*args, **kw)
            jax.block_until_ready(v2)
        t0 = t("query_major x3 (cached)", t0)

    # ---- recall: smart probing on/off, full probe ----
    true_idx = brute_force_topk(base, query, 10)
    t0 = t("brute force gt", t0)
    ids_map = np.arange(n_base)
    for smart in (False, True):
        index.use_smart_probing = smart
        for n_probe in (8, 32, 128, n_cells):
            index.n_probe = n_probe
            vals, pred = index.search(jnp.asarray(query.T), k=10)
            rec = recall_at_k(np.asarray(pred), true_idx, ids_map, 10)
            print(f"  recall@10 smart={smart} n_probe={n_probe}: {rec:.4f}",
                  flush=True)
    t0 = t("recall sweeps", t0)


if __name__ == "__main__":
    main()
