"""Locate the d=960 probed-scan bottleneck (VERDICT r3 #2 follow-up).

The r4 GIST int8 sweep recorded np=32 k=10 at 32.1k q/s while the fused
kernel's window DMA + MXU cost models out at >500k q/s for the same block
count — the time is in the XLA glue around the kernel. This times the
composed levels (search / scan_cell_major / coarse / pack) plus isolated
microbenches of the two gather suspects (the [B, p_tile, d] query-tile
gather and the [n_pairs, k_pair] unsort row gather) at the sweep-identical
int8 d=960 config, so the fix lands on the measured stage.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

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
    dt = (time.perf_counter() - t0) / reps * 1e3
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    return dt


def main():
    n_base, d, n_cells, m, nq = 1_000_000, 960, 4096, 64, 1000
    base, query = make_data(n_base, nq, d, spectrum="manifold-12")
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       scan_cache_dtype="int8",
                       initial_size=max(16, (n_base // n_cells) * 2))
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    index.scan_group = 4
    t0 = time.perf_counter()
    state = "/tmp/gist_int8_state.npz"
    if os.path.exists(state):
        index.load(state)
        print(f"loaded in {time.perf_counter() - t0:.0f}s", flush=True)
    else:
        index.train(jnp.asarray(base[:100_000]).T)
        for i in range(0, n_base, 62_500):
            index.add(jnp.asarray(base[i:i + 62_500]).T)
        index.save(state)
        print(f"build {time.perf_counter() - t0:.0f}s "
              f"s_max={index.max_cell_capacity}", flush=True)

    q = jnp.asarray(query)
    qj = q.T
    cb = index.vq_codec.kmeans._centroids[0]
    s_max = int(index.max_cell_capacity)
    index.scan_mode = "cell_major"

    for n_probe, k in ((32, 10), (32, 100), (128, 100)):
        index.n_probe = n_probe
        dt = timeit(lambda: index.search(qj, k=k))
        print(f"np={n_probe} k={k} search: {dt:.1f} ms "
              f"({nq / dt * 1e3:,.0f} q/s) gate={dict(adc.LAST_GATE)}",
              flush=True)
        _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0),
                                       n_probe=n_probe, use_smart=True,
                                       precision=None, approx=True)
        dt = timeit(lambda: adc.scan_cell_major(
            q, cells, mask, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity,
            k=k, distance="euclidean", s_max=s_max, n_cells=n_cells,
            approx=True, impl="pallas", group=4,
            scales=index.aux("scale")[:, 0]))
        print(f"  scan_cell_major composed: {dt:.1f} ms", flush=True)
        dt = timeit(lambda: _coarse_probe(
            q, cb, jnp.float32(30.0), n_probe=n_probe, use_smart=True,
            precision=None, approx=True))
        print(f"  coarse: {dt:.1f} ms", flush=True)

        # shape-matched microbenches of the two gather suspects
        p_tile = 128
        n_pairs = nq * n_probe
        b_max = util.round_up(min(n_cells, n_pairs)
                              + util.cdiv(n_pairs, p_tile), 8)
        d_pad = 1024
        qtab = jnp.asarray(
            np.random.randint(-127, 127, (nq, d_pad), dtype=np.int8))
        qidx = jnp.asarray(
            np.random.randint(0, nq, (b_max, p_tile), dtype=np.int32))

        def qgather(qtab, qidx):
            return qtab[qidx]

        jg = jax.jit(qgather)
        dt = timeit(jg, qtab, qidx)
        mb = b_max * p_tile * d_pad / 1e6
        print(f"  [micro] qvecs gather [{b_max}x{p_tile}x{d_pad}] int8 "
              f"({mb:.0f} MB out): {dt:.1f} ms "
              f"-> {mb / dt:.1f} GB/s", flush=True)

        for k_pair in (k if k <= 64 else 64,):
            combo = jnp.asarray(np.random.randint(
                -2**30, 2**30, (b_max * p_tile, k_pair), dtype=np.int32))
            ridx = jnp.asarray(np.random.randint(
                0, b_max * p_tile, (n_pairs,), dtype=np.int32))

            def unsort(c, r):
                return c[r]

            ju = jax.jit(unsort)
            dt = timeit(ju, combo, ridx)
            mb2 = n_pairs * k_pair * 4 / 1e6
            print(f"  [micro] unsort gather [{n_pairs}x{k_pair}] i32 "
                  f"({mb2:.0f} MB out): {dt:.1f} ms -> {mb2 / dt:.1f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
