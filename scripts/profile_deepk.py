"""Deep-k (k=100) stage accounting at the 1M bench shape.

The k>32 final merge is the round-3 target: A/B the bitonic run-merge
(ops/bitonic.py) against the lax.top_k full sort it replaced, time the
unsort gather at k_pair=64, and measure the composed scan + index.search
at n_probe 32/64 so the k=100 headline number has a stage budget.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

_cache_dir = os.path.expanduser("~/.cache/torchpq_tpu_jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_data
from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.index.ivfpq import _coarse_probe
from torchpq_tpu.ops import adc, bitonic
from torchpq_tpu import util


def timeit(f, *a, reps=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[0])  # poison check
    return dt


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_topk(pcq, *, k):
    sel = adc._sortable_i32_f32(pcq)
    fvs, fi = jax.lax.top_k(sel, k)
    return fvs, jnp.take_along_axis(pcq, fi, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "k_pair"))
def _merge_bitonic(pcq, *, k, k_pair):
    nq = pcq.shape[0]
    r = pcq.shape[1] // k_pair
    pidx = jnp.broadcast_to(
        jnp.arange(r, dtype=jnp.int32)[None, :, None], (nq, r, k_pair))
    return bitonic.merge_runs_topk(pcq.reshape(nq, r, k_pair), pidx, k)


def main():
    n_base, d, n_cells, m, nq = 1_000_000, 128, 4096, 64, 10_000
    k = 100
    base, query = make_data(n_base, nq, d, spectrum="manifold-12")
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 2)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    t0 = time.perf_counter()
    state = "/tmp/profile_1m_state.npz"
    if os.path.exists(state):
        index.load(state)
        print(f"loaded {state} in {time.perf_counter() - t0:.0f}s",
              flush=True)
    else:
        index.train(jnp.asarray(base[:100_000]).T)
        for i in range(0, n_base, 250_000):
            index.add(jnp.asarray(base[i:i + 250_000]).T)
        index.save(state)
        print(f"build {time.perf_counter() - t0:.0f}s  "
              f"s_max={index.max_cell_capacity}", flush=True)

    q = jnp.asarray(query)
    cb = index.vq_codec.kmeans._centroids[0]
    decoded = index.aux("decoded")
    norms = index.aux("norm")[:, 0]
    is_empty = index._is_empty
    cstart = index._cell_start
    ccap = index._cell_capacity
    s_max = int(index.max_cell_capacity)

    for n_probe in (8, 32, 64):
        _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0),
                                       n_probe=n_probe, use_smart=True,
                                       precision=None, approx=True)
        jax.block_until_ready(cells)
        # composed scan: impl x supercell group x probe_cap (deep-k
        # bookkeeping is per-pair; groups + the static probe cap shrink it)
        for impl, group, cap in (
                ("pallas", 1, None), ("pallas", 4, None), ("pallas", 8, None),
                ("pallas", 4, max(2 * n_probe // 4, 8)),
                ("pallas", 8, max(2 * n_probe // 8, 8)),
                ("xla", 4, None)):
            dt = timeit(lambda impl=impl, group=group, cap=cap:
                        adc.scan_cell_major(
                q, cells, mask, decoded, norms, is_empty, cstart, ccap,
                k=k, distance="euclidean", s_max=s_max, n_cells=n_cells,
                approx=True, impl=impl, group=group, probe_cap=cap))
            print(f"np={n_probe} k={k} scan_cell_major[{impl},g{group},"
                  f"cap{cap}]: {dt:.1f} ms -> {nq / dt * 1e3:,.0f} q/s",
                  flush=True)

        # merge A/B on representative packed data (descending runs)
        k_pair = 64
        keys = jax.random.randint(
            jax.random.PRNGKey(0), (nq, n_probe, k_pair),
            -2 ** 30, 2 ** 30, jnp.int32)
        keys = -jnp.sort(-keys, axis=-1)
        pcq = keys.reshape(nq, n_probe * k_pair)
        jax.block_until_ready(pcq)
        dt = timeit(lambda: _merge_topk(pcq, k=k))
        print(f"  merge top_k [{nq}x{n_probe * k_pair}]: {dt:.1f} ms",
              flush=True)
        dt = timeit(lambda: _merge_bitonic(pcq, k=k, k_pair=k_pair))
        print(f"  merge bitonic [{nq}x{n_probe}x{k_pair}]: {dt:.1f} ms",
              flush=True)

        index.n_probe = n_probe
        index.scan_mode = "cell_major"
        index.scan_group = 4
        for cap in (None, "auto"):
            index.scan_probe_cap = cap
            dt = timeit(lambda: index.search(q.T, k=k))
            print(f"  index.search[cell_major,auto,g4,cap={cap}]: "
                  f"{dt:.1f} ms -> {nq / dt * 1e3:,.0f} q/s", flush=True)
        index.scan_probe_cap = None
        index.scan_mode = "auto"


if __name__ == "__main__":
    main()
