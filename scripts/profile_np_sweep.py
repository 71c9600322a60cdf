"""Sweep p_tile x group at n_probe in {32, 128} + isolate merge/unsort cost.

Analysis: at high n_probe the pair-driven block count (n_pairs / p_tile)
dominates b_max, and every block DMAs a full [s_eff, d] window — so larger
p_tile amortizes window bytes over more probers. The unsort gather moves
n_pairs * 2k int32; this script times it in isolation.
"""

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
from torchpq_tpu.ops import adc
from torchpq_tpu import util


def timeit(f, *a, reps=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n_base, d, n_cells, m, nq = 1_000_000, 128, 4096, 64, 10_000
    base, query = make_data(n_base, nq, d)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 3)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    t0 = time.perf_counter()
    index.train(jnp.asarray(base[:100_000]).T)
    print(f"train {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(0, n_base, 250_000):
        index.add(jnp.asarray(base[i:i + 250_000]).T)
    print(f"add {time.perf_counter() - t0:.0f}s  "
          f"s_max={index.max_cell_capacity}", flush=True)

    q = jnp.asarray(query)
    cb = index.vq_codec.kmeans._centroids[0]
    args = (q, None, None, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity)
    s_max = index.max_cell_capacity

    for n_probe in (32, 128):
        _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0),
                                       n_probe=n_probe, use_smart=True,
                                       precision=None, approx=True)
        a = (q, cells, mask) + args[3:]
        # s_max < true capacity is timing-only (truncated windows) — it
        # models what a tighter per-cell capacity would buy
        for sm in (1024, 512):
            kw = dict(k=10, distance="euclidean", s_max=sm, n_cells=n_cells,
                      approx=True)
            for group in (1, 4):
                for pt in (128, 512):
                    try:
                        f = lambda: adc.scan_cell_major(*a, p_tile=pt,
                                                        group=group, **kw)
                        dt = timeit(f)
                        print(f"np={n_probe} sm={sm} g={group} pt={pt}: "
                              f"{dt:.1f} ms -> {nq / dt * 1e3:,.0f} q/s",
                              flush=True)
                    except Exception as e:
                        print(f"np={n_probe} sm={sm} g={group} pt={pt} FAIL "
                              f"{type(e).__name__}: {str(e)[:150]}",
                              flush=True)

        # isolate: unsort gather + final merge cost at this n_probe
        n_pairs = nq * n_probe
        k_pair = 10
        for pt in (128, 512):
            b_max = util.round_up(
                min(n_cells, n_pairs) + util.cdiv(n_pairs, pt), 8)
            combo = jnp.zeros((b_max, pt, 2 * k_pair), jnp.int32)
            bo = jnp.asarray(
                np.random.default_rng(0).integers(0, b_max, n_pairs),
                jnp.int32)
            so = jnp.asarray(
                np.random.default_rng(1).integers(0, pt, n_pairs), jnp.int32)

            @jax.jit
            def merge(combo, bo, so):
                pc = combo[bo, so]
                out = pc.reshape(nq, n_probe, 2 * k_pair)
                keys = out[:, :, :k_pair].reshape(nq, n_probe * k_pair)
                addrs = out[:, :, k_pair:].reshape(nq, n_probe * k_pair)
                fk, fi = jax.lax.top_k(keys, 10)
                return fk, jnp.take_along_axis(addrs, fi, axis=1)

            dt = timeit(merge, combo, bo, so)
            print(f"np={n_probe} pt={pt} unsort+merge alone: {dt:.1f} ms",
                  flush=True)

            @jax.jit
            def merge_gather_only(combo, bo, so):
                return combo[bo, so]

            dt = timeit(merge_gather_only, combo, bo, so)
            print(f"np={n_probe} pt={pt} unsort gather alone: {dt:.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
