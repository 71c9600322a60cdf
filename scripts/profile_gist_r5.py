"""Round-5 GIST (d=960) glue fix verification + remaining-stage hunt.

r4 measured the composed np=32 k=10 scan at 15.7 ms with the [B, p_tile,
d_pad] query-tile gather as the named suspect (the r4 micro overestimated
its b_max; the real staging is [~1280, 128, 1024] int8 ~ 168 MB). This
script (1) smoke-tests the new resident-qtable kernel mode on-chip,
(2) re-times the composed scan with the qtable mode on vs off,
(3) breaks the 7.3 ms coarse stage into sub-stages, and (4) times the
unsort row-gather variants (the r4 micro's [32000, 10] gather read 0.1
GB/s — lane-hostile row width suspected).
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
from torchpq_tpu.ops import pallas_scan
from torchpq_tpu import util, config
from torchpq_tpu.metric import negative_squared_l2_distance


def timeit(f, *a, reps=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


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

    # ---- (1) qtable kernel smoke at a tiny on-chip shape ----
    _, cells1, mask1 = _coarse_probe(q[:64], cb, jnp.float32(30.0),
                                     n_probe=4, use_smart=False,
                                     precision=None, approx=True)
    v, a = adc.scan_cell_major(
        q[:64], cells1, mask1, index.aux("decoded"),
        index.aux("norm")[:, 0], index._is_empty, index._cell_start,
        index._cell_capacity, k=10, distance="euclidean", s_max=s_max,
        n_cells=n_cells, approx=True, impl="pallas", group=4,
        scales=index.aux("scale")[:, 0])
    jax.block_until_ready((v, a))
    print(f"qtable smoke: gate={dict(adc.LAST_GATE)} "
          f"valid={int((np.asarray(a) >= 0).sum())}", flush=True)

    # ---- (3) coarse sub-stages ----
    jm = jax.jit(lambda q, cb: negative_squared_l2_distance(q, cb))
    print(f"coarse matmul [1000x960]x[4096x960]: {timeit(jm, q, cb):.2f} ms",
          flush=True)
    sims = jm(q, cb)
    for np_ in (32, 128):
        ja = jax.jit(lambda s: jax.lax.approx_max_k(
            s, np_, recall_target=config.COARSE_RECALL_TARGET))
        jt = jax.jit(lambda s: jax.lax.top_k(s, np_))
        print(f"  approx_max_k k={np_}: {timeit(ja, sims):.2f} ms | "
              f"top_k: {timeit(jt, sims):.2f} ms", flush=True)
    jc = jax.jit(lambda q, cb: _coarse_probe(
        q, cb, jnp.float32(30.0), n_probe=32, use_smart=True,
        precision=None, approx=True))
    jc_ns = jax.jit(lambda q, cb: _coarse_probe(
        q, cb, jnp.float32(30.0), n_probe=32, use_smart=False,
        precision=None, approx=True))
    print(f"  _coarse_probe smart: {timeit(jc, q, cb):.2f} ms | "
          f"no-smart: {timeit(jc_ns, q, cb):.2f} ms", flush=True)

    # ---- (4) unsort gather variants at the REAL b_max ----
    p_tile = 128
    for n_probe, k_pair in ((32, 10), (32, 64), (128, 64)):
        n_pairs = nq * n_probe
        n_super = n_cells // 4
        b_max = util.round_up(min(n_super, n_pairs)
                              + util.cdiv(n_pairs, p_tile), 8)
        combo = jnp.asarray(np.random.randint(
            -2**30, 2**30, (b_max * p_tile, k_pair), dtype=np.int32))
        ridx = jnp.asarray(np.random.randint(
            0, b_max * p_tile, (n_pairs,), dtype=np.int32))
        g1 = jax.jit(lambda c, r: c[r])
        dt = timeit(g1, combo, ridx)
        mb = n_pairs * k_pair * 4 / 1e6
        print(f"unsort np={n_probe} kp={k_pair} rows[{b_max * p_tile}x"
              f"{k_pair}]: {dt:.2f} ms ({mb / dt:.1f} GB/s)", flush=True)
        # variant: 128-lane padded rows (pad combo cols up to 32/128)
        for padw in (32, 128):
            if padw <= k_pair:
                continue
            combo_p = jnp.asarray(np.random.randint(
                -2**30, 2**30, (b_max * p_tile, padw), dtype=np.int32))
            gp = jax.jit(lambda c, r: c[r, :k_pair])
            dt2 = timeit(gp, combo_p, ridx)
            print(f"  padded-to-{padw} rows: {dt2:.2f} ms", flush=True)

    # ---- (2) composed scan: qtable on vs off ----
    # np=8 rows: the r4 sweep's non-monotonic anomaly (np=8 k10 23.4k <
    # np=32 32.1k at IDENTICAL gates) — watch the coarse/scan split
    for n_probe, k in ((8, 10), (32, 10), (32, 100), (128, 100)):
        index.n_probe = n_probe
        dt = timeit(lambda: index.search(qj, k=k))
        print(f"np={n_probe} k={k} search: {dt:.1f} ms "
              f"({nq / dt * 1e3:,.0f} q/s) gate={dict(adc.LAST_GATE)}",
              flush=True)
        _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0),
                                       n_probe=n_probe, use_smart=True,
                                       precision=None, approx=True)

        def scan(k_=k):
            return adc.scan_cell_major(
                q, cells, mask, index.aux("decoded"),
                index.aux("norm")[:, 0], index._is_empty,
                index._cell_start, index._cell_capacity,
                k=k_, distance="euclidean", s_max=s_max, n_cells=n_cells,
                approx=True, impl="pallas", group=4,
                scales=index.aux("scale")[:, 0])

        dt = timeit(scan)
        print(f"  scan qtable={adc.LAST_GATE.get('qtable')}: {dt:.1f} ms",
              flush=True)
        saved = pallas_scan.QTABLE_VMEM_BYTES
        pallas_scan.QTABLE_VMEM_BYTES = 0
        try:
            dt = timeit(lambda: scan(k + 1))  # fresh trace at qtable=off
            print(f"  scan qtable=off: {dt:.1f} ms", flush=True)
        finally:
            pallas_scan.QTABLE_VMEM_BYTES = saved


if __name__ == "__main__":
    main()
