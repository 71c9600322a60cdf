"""Stage-level profiling of the 1M-scale scan on the real chip."""

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
                       initial_size=(n_base // n_cells) * 2)
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
          f"s_max={index.max_cell_capacity}  "
          f"mean={float(np.asarray(index._cell_size).mean()):.0f}  "
          f"max={int(np.asarray(index._cell_size).max())}", flush=True)

    q = jnp.asarray(query)
    cb = index.vq_codec.kmeans._centroids[0]
    decoded = index.aux("decoded")
    norms = index.aux("norm")[:, 0]
    is_empty = index._is_empty
    cstart = index._cell_start
    ccap = index._cell_capacity
    s_max = index.max_cell_capacity

    for n_probe in (32, 128):
        dt = timeit(lambda: _coarse_probe(
            q, cb, jnp.float32(30.0), n_probe=n_probe, use_smart=True,
            precision=None, approx=True))
        print(f"np={n_probe} coarse: {dt:.1f} ms", flush=True)
        _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0),
                                       n_probe=n_probe, use_smart=True,
                                       precision=None, approx=True)
        n_pairs = nq * n_probe
        p_tile = 256
        b_max = util.round_up(
            min(n_cells, n_pairs) + util.cdiv(n_pairs, p_tile), 8)
        print(f"  b_max={b_max}", flush=True)

        # stage: pack (argsort + tables)
        @jax.jit
        def pack(cells, mask):
            flat = jnp.where(mask.reshape(-1), cells.reshape(-1),
                             jnp.int32(n_cells))
            order = jnp.argsort(flat)
            return order, flat[order]
        dt = timeit(pack, cells, mask)
        print(f"  pack(argsort): {dt:.1f} ms", flush=True)

        from torchpq_tpu.ops import adc
        for pt in (128, 256):
            f = lambda pt=pt: adc.scan_cell_major(
                q, cells, mask, decoded, norms, is_empty, cstart, ccap,
                k=10, distance="euclidean", s_max=s_max, n_cells=n_cells,
                p_tile=pt, approx=True)
            dt = timeit(f)
            print(f"  scan p_tile={pt}: {dt:.1f} ms -> {nq / dt * 1e3:,.0f} q/s",
                  flush=True)


if __name__ == "__main__" and not os.environ.get("IMPL_COMPARE"):
    main()


def impl_compare():
    n_base, d, n_cells, m, nq = 1_000_000, 128, 4096, 64, 10_000
    base, query = make_data(n_base, nq, d)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 2)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    index.train(jnp.asarray(base[:100_000]).T)
    for i in range(0, n_base, 250_000):
        index.add(jnp.asarray(base[i:i + 250_000]).T)
    print(f"built. s_max={index.max_cell_capacity}", flush=True)
    q = jnp.asarray(query)
    cb = index.vq_codec.kmeans._centroids[0]
    for n_probe in (32, 128):
        _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0),
                                       n_probe=n_probe, use_smart=True,
                                       precision=None, approx=True)
        from torchpq_tpu.ops import adc
        args = (q, cells, mask, index.aux("decoded"),
                index.aux("norm")[:, 0], index._is_empty,
                index._cell_start, index._cell_capacity)
        kw = dict(k=10, distance="euclidean",
                  s_max=index.max_cell_capacity, n_cells=n_cells)
        for k in (10, 100):
            kw = dict(k=k, distance="euclidean",
                      s_max=index.max_cell_capacity, n_cells=n_cells)
            for impl, approx in [("xla", True), ("pallas", True),
                                 ("pallas", False)]:
                for pt in (128, 256):
                    try:
                        f = lambda: adc.scan_cell_major(
                            *args, p_tile=pt, approx=approx, impl=impl, **kw)
                        dt = timeit(f)
                        print(f"np={n_probe} k={k} impl={impl} approx="
                              f"{approx} p_tile={pt}: {dt:.1f} ms -> "
                              f"{nq / dt * 1e3:,.0f} q/s", flush=True)
                    except Exception as e:
                        print(f"np={n_probe} k={k} impl={impl} approx="
                              f"{approx} pt={pt} FAIL {type(e).__name__}: "
                              f"{str(e)[:200]}", flush=True)
        # agreement + approx-recall checks at k=10
        kw = dict(k=10, distance="euclidean",
                  s_max=index.max_cell_capacity, n_cells=n_cells)
        v1, a1 = adc.scan_cell_major(*args, impl="xla", approx=False, **kw)
        v2, a2 = adc.scan_cell_major(*args, impl="pallas", approx=False, **kw)
        agree = float((np.asarray(a1) == np.asarray(a2)).mean())
        print(f"np={n_probe} xla/pallas exact address agreement: {agree:.4f}",
              flush=True)
        _, a3 = adc.scan_cell_major(*args, impl="pallas", approx=True, **kw)
        a1n, a3n = np.asarray(a1), np.asarray(a3)
        rec = np.mean([len(set(a3n[i]) & set(a1n[i])) / 10
                       for i in range(nq)])
        print(f"np={n_probe} pallas-approx recall vs exact: {rec:.4f}",
              flush=True)


if __name__ == "__main__" and os.environ.get("IMPL_COMPARE"):
    impl_compare()
