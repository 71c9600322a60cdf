"""Synthetic-state scan micro-benchmarks (no index build — pure timing).

Answers, on the real chip:
  1. flat ADC scan: [nq, d] x [d, cap] chunked matmul + per-chunk approx
     top-k + final merge — candidate replacement for high-n_probe search.
  2. cell-major block-loop decomposition at np=128: qvecs gather cost,
     loop without top-k, loop without matmul.
  3. coarse probe variants: approx_max_k(128) vs top_k(128) vs matmul only.
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

from torchpq_tpu import util


def timeit(f, *a, reps=5):
    """block_until_ready timing + one tiny D2H sanity pull (detects the
    silent-OOM mode where everything 'completes' instantly). Outputs must be
    small or in-jit reduced — full-size D2H rides a ~32 MB/s tunnel here."""
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[0])  # sanity: raises/hangs if poisoned
    return dt


NQ, D, CAP, K = 10_000, 128, 4_194_304, 10


# ---------------- 1. flat ADC scan (the real op) ----------------

def bench_flat():
    from torchpq_tpu.ops.flat_adc import flat_adc_scan
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(NQ, D)).astype(np.float32))
    tile = jnp.asarray(rng.normal(size=(65536, D)).astype(np.float32))
    decoded = jnp.tile(tile, (CAP // 65536, 1)).astype(jnp.bfloat16)
    pen = jnp.sum(jnp.square(decoded.astype(jnp.float32)), axis=-1)
    jax.block_until_ready((decoded, pen))
    for chunk in (16384, 32768, 65536, 131072):
        dt = timeit(lambda c=chunk: flat_adc_scan(
            q, decoded, pen, k=K, distance="euclidean", chunk=c, approx=True))
        print(f"flat bf16 chunk={chunk}: {dt:.1f} ms -> "
              f"{NQ / dt * 1e3:,.0f} q/s", flush=True)
    dt = timeit(lambda: flat_adc_scan(
        q, decoded, pen, k=K, distance="euclidean", chunk=65536,
        approx=False))
    print(f"flat bf16 chunk=65536 exact-chunk-topk: {dt:.1f} ms", flush=True)
    dec8 = jnp.clip(jnp.round(decoded.astype(jnp.float32) * 25), -127,
                    127).astype(jnp.int8)
    scales = jnp.full((CAP,), 1 / 25.0, jnp.float32)
    jax.block_until_ready(dec8)
    for chunk in (32768, 65536, 131072):
        dt = timeit(lambda c=chunk: flat_adc_scan(
            q, dec8, pen, k=K, distance="euclidean", chunk=c, approx=True,
            scales=scales))
        print(f"flat int8 chunk={chunk}: {dt:.1f} ms -> "
              f"{NQ / dt * 1e3:,.0f} q/s", flush=True)


# ---------------- 2. block-loop decomposition (np=128 shapes) ----------------

def bench_blocks():
    n_probe, p_tile, s_eff, bc = 128, 128, 1024, 8
    n_pairs = NQ * n_probe
    b_max = util.round_up(min(4096, n_pairs) + util.cdiv(n_pairs, p_tile), bc)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(NQ, D)).astype(np.float32))
    decoded = jnp.asarray(
        rng.normal(size=(CAP, D)).astype(np.float32)).astype(jnp.bfloat16)
    pen_arr = jnp.asarray(rng.normal(size=(CAP,)).astype(np.float32) ** 2)
    qidx = jnp.asarray(rng.integers(0, NQ, size=(b_max, p_tile)), jnp.int32)
    starts = jnp.asarray(
        (rng.integers(0, (CAP - s_eff) // 16, size=b_max) * 16), jnp.int32)

    @jax.jit
    def qgather(q, qidx):
        return q[qidx].astype(jnp.bfloat16)

    dt = timeit(qgather, q, qidx)
    print(f"blocks qvecs gather [{b_max}x{p_tile}x{D}]: {dt:.1f} ms",
          flush=True)
    qvecs_all = qgather(q, qidx)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def loop(qvecs_all, starts, decoded, pen_arr, *, mode):
        nbc = b_max // bc
        def one(args):
            qv, st = args  # [bc, p, d], [bc]
            cand = jnp.stack([
                jax.lax.dynamic_slice(decoded, (st[i], 0), (s_eff, D))
                for i in range(bc)])
            pen = jnp.stack([
                jax.lax.dynamic_slice(pen_arr, (st[i],), (s_eff,))
                for i in range(bc)])
            if mode == "dma_only":
                return (jnp.sum(cand.astype(jnp.float32))
                        + jnp.sum(pen))
            ab = jnp.einsum("bpd,bsd->bps", qv, cand,
                            preferred_element_type=jnp.float32)
            s = 2.0 * ab - pen[:, None, :]
            if mode == "mm_only":
                return jnp.sum(s)
            v, i = jax.lax.approx_max_k(s, K)
            return jnp.sum(v) + jnp.sum(i).astype(jnp.float32)
        xs = (qvecs_all.reshape(nbc, bc, p_tile, D),
              starts.reshape(nbc, bc))
        return jax.lax.map(one, xs)

    for mode in ("dma_only", "mm_only", "full"):
        dt = timeit(lambda m=mode: loop(qvecs_all, starts, decoded, pen_arr,
                                        mode=m))
        print(f"blocks loop {mode}: {dt:.1f} ms", flush=True)


# ---------------- 3. coarse variants ----------------

def bench_coarse():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(NQ, D)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(4096, D)).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("mode", "np_"))
    def coarse(q, cb, *, mode, np_):
        ab = jnp.dot(q, cb.T, preferred_element_type=jnp.float32)
        s = 2.0 * ab - jnp.sum(jnp.square(cb), axis=1)[None, :]
        if mode == "mm":
            return s
        if mode == "approx":
            return jax.lax.approx_max_k(s, np_)
        if mode == "approx90":
            return jax.lax.approx_max_k(s, np_, recall_target=0.90)
        if mode == "exact":
            return jax.lax.top_k(s, np_)
        if mode == "mm_bf16":
            ab = jnp.dot(q.astype(jnp.bfloat16), cb.T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            s = 2.0 * ab - jnp.sum(jnp.square(cb), axis=1)[None, :]
            return jax.lax.approx_max_k(s, np_)

    for np_ in (32, 128):
        for mode in ("mm", "approx", "approx90", "exact", "mm_bf16"):
            dt = timeit(lambda m=mode, n=np_: coarse(q, cb, mode=m, np_=n))
            print(f"coarse np={np_} {mode}: {dt:.1f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "flat"):
        bench_flat()
    if which in ("all", "blocks"):
        bench_blocks()
    if which in ("all", "coarse"):
        bench_coarse()


# ---------------- 4. merge-stage variants (np=128 shapes) ----------------

def bench_merge():
    n_probe, k_pair = 128, 10
    n_pairs = NQ * n_probe
    rng = np.random.default_rng(3)
    for pt in (128,):
        b_max = util.round_up(min(4096, n_pairs) + util.cdiv(n_pairs, pt), 8)
        combo10 = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(b_max, pt, k_pair),
                         dtype=np.int64).astype(np.int32))
        combo20 = jnp.concatenate([combo10, combo10], axis=-1)
        bo = jnp.asarray(rng.integers(0, b_max, n_pairs), jnp.int32)
        so = jnp.asarray(rng.integers(0, pt, n_pairs), jnp.int32)

        @jax.jit
        def g10(c, bo, so):
            return jnp.sum(c[bo, so])

        @jax.jit
        def g20(c, bo, so):
            return jnp.sum(c[bo, so])

        print(f"pt={pt} gather rows k=10: {timeit(g10, combo10, bo, so):.1f} ms",
              flush=True)
        print(f"pt={pt} gather rows k=20: {timeit(g20, combo20, bo, so):.1f} ms",
              flush=True)

        # 1D-ified gather of the same payload
        flat10 = combo10.reshape(-1, k_pair)
        rows = bo * pt + so

        @jax.jit
        def g1d(c, rows):
            return jnp.sum(c[rows])

        print(f"pt={pt} gather rows flat-idx k=10: "
              f"{timeit(g1d, flat10, rows):.1f} ms", flush=True)

        # k separate element gathers (column-major payload)
        cols = jnp.asarray(
            rng.integers(-2**31, 2**31 - 1, size=(k_pair, b_max * pt),
                         dtype=np.int64).astype(np.int32))

        @jax.jit
        def gcols(cols, rows):
            return jnp.sum(cols[:, rows])

        print(f"pt={pt} gather cols-major k=10: "
              f"{timeit(gcols, cols, rows):.1f} ms", flush=True)

    # final-merge selection variants on [NQ, n_probe * k_pair]
    keys_i = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, size=(NQ, n_probe * k_pair),
                     dtype=np.int64).astype(np.int32))
    keys_f = jnp.asarray(
        rng.normal(size=(NQ, n_probe * k_pair)).astype(np.float32))

    @jax.jit
    def tki(x):
        v, i = jax.lax.top_k(x, 10)
        return jnp.sum(v) + jnp.sum(i)

    @jax.jit
    def amk(x):
        v, i = jax.lax.approx_max_k(x, 10)
        return jnp.sum(v) + jnp.sum(i)

    print(f"final top_k i32 [{NQ},1280]: {timeit(tki, keys_i):.1f} ms",
          flush=True)
    print(f"final top_k f32 [{NQ},1280]: {timeit(tki, keys_f):.1f} ms",
          flush=True)
    print(f"final approx_max_k f32 [{NQ},1280]: {timeit(amk, keys_f):.1f} ms",
          flush=True)

    # decode + select + two take_alongs (the full pack32 tail minus gather)
    from torchpq_tpu.ops.adc import _sortable_i32_f32

    @jax.jit
    def tail(keys, starts_q):
        sel = _sortable_i32_f32(keys)
        fvs, fi = jax.lax.approx_max_k(sel, 10)
        packed_w = jnp.take_along_axis(keys, fi, axis=1)
        start_w = jnp.take_along_axis(starts_q, fi // k_pair, axis=1)
        return jnp.sum(packed_w) + jnp.sum(start_w) + jnp.sum(fvs)

    starts_q = jnp.asarray(
        rng.integers(0, 4_000_000, size=(NQ, n_probe)).astype(np.int32))
    print(f"pack32 tail (decode+amk+takes): {timeit(tail, keys_i, starts_q):.1f} ms",
          flush=True)


if __name__ == "__main__" and which in ("all", "merge"):
    bench_merge()


# ---------------- 5. full scan_cell_major on synthetic state ----------------

def bench_scan():
    from torchpq_tpu.ops import adc
    rng = np.random.default_rng(4)
    n_cells, per_cell = 4096, 1024
    cap = n_cells * per_cell
    tile = jnp.asarray(rng.normal(size=(65536, D)).astype(np.float32))
    decoded = jnp.tile(tile, (cap // 65536, 1)).astype(jnp.bfloat16)
    norms = jnp.sum(jnp.square(decoded.astype(jnp.float32)), axis=-1)
    is_empty = jnp.zeros((cap,), bool)
    cell_start = jnp.arange(n_cells, dtype=jnp.int32) * per_cell
    cell_capacity = jnp.full((n_cells,), per_cell, jnp.int32)
    q = jnp.asarray(rng.normal(size=(NQ, D)).astype(np.float32))
    jax.block_until_ready(decoded)

    @jax.jit
    def reduce_out(vals, addr):
        return jnp.sum(vals) + jnp.sum(addr).astype(jnp.float32)

    for n_probe in (32, 128):
        cells = jnp.asarray(
            np.stack([rng.choice(n_cells, n_probe, replace=False)
                      for _ in range(NQ)]).astype(np.int32))
        mask = jnp.ones((NQ, n_probe), bool)
        for approx, group, pt in ((True, 1, 128), (False, 1, 128),
                                  (True, 4, 128), (True, 4, 512),
                                  (True, 1, 512)):
            f = lambda a=approx, g=group, p=pt: reduce_out(*adc.scan_cell_major(
                q, cells, mask, decoded, norms, is_empty, cell_start,
                cell_capacity, k=K, distance="euclidean", s_max=per_cell,
                n_cells=n_cells, p_tile=p, approx=a, group=g))
            dt = timeit(f)
            tag = "pack32" if approx else "exact "
            print(f"scan np={n_probe} {tag} g={group} pt={pt}: {dt:.1f} ms "
                  f"-> {NQ / dt * 1e3:,.0f} q/s", flush=True)


if __name__ == "__main__" and which in ("all", "scan"):
    bench_scan()


# ---------------- 6. fused pallas flat scan ----------------

def bench_pflat():
    from torchpq_tpu.ops.flat_adc import _flat_pallas_glue, flat_adc_scan
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(NQ, D)).astype(np.float32))
    tile = jnp.asarray(rng.normal(size=(65536, D)).astype(np.float32))
    decoded = jnp.tile(tile, (CAP // 65536, 1)).astype(jnp.bfloat16)
    pen = jnp.sum(jnp.square(decoded.astype(jnp.float32)), axis=-1)
    jax.block_until_ready((decoded, pen))
    # warm the timing harness on something unrelated (first-measure slot
    # has produced bogus numbers in past runs)
    timeit(lambda: jnp.sum(pen), reps=2)
    dt = timeit(lambda: _flat_pallas_glue(q, decoded, pen, k=K,
                                          distance="euclidean"))
    print(f"pallas flat: {dt:.1f} ms -> {NQ / dt * 1e3:,.0f} q/s", flush=True)
    dt = timeit(lambda: flat_adc_scan(q, decoded, pen, k=K,
                                      distance="euclidean", chunk=131072,
                                      approx=True))
    print(f"xla flat   : {dt:.1f} ms -> {NQ / dt * 1e3:,.0f} q/s", flush=True)
    # agreement between the two on the top-1
    v1, a1 = _flat_pallas_glue(q, decoded, pen, k=K, distance="euclidean")
    v2, a2 = flat_adc_scan(q, decoded, pen, k=K, distance="euclidean",
                           chunk=131072, approx=False)
    a1, a2 = np.asarray(a1), np.asarray(a2)
    top1 = (a1[:, 0] == a2[:, 0]).mean()
    ov = np.mean([len(np.intersect1d(x, y)) / K for x, y in zip(a1, a2)])
    print(f"pallas vs exact-xla: top1 {top1:.4f} overlap@{K} {ov:.4f}",
          flush=True)


if __name__ == "__main__" and which in ("all", "pflat"):
    bench_pflat()


# ---------------- 7. cell-major pallas stage breakdown ----------------

def bench_stages():
    """Time each stage of the np=32 pallas cell-major path separately
    (separate jits: an upper bound on the fused cost, good enough to find
    the elephant)."""
    import functools as ft
    from torchpq_tpu.ops import adc
    from torchpq_tpu.ops.pallas_scan import scan_blocks_pallas
    rng = np.random.default_rng(6)
    n_cells, per_cell = 4096, 512
    cap = n_cells * per_cell
    n_probe, p_tile, k_pair = 32, 128, K
    n_pairs = NQ * n_probe
    b_max = util.round_up(min(n_cells, n_pairs) + util.cdiv(n_pairs, p_tile), 8)
    s_eff = per_cell
    tile = jnp.asarray(rng.normal(size=(65536, D)).astype(np.float32))
    decoded = jnp.tile(tile, (cap // 65536, 1)).astype(jnp.bfloat16)
    norms = jnp.sum(jnp.square(decoded.astype(jnp.float32)), axis=-1)
    is_empty = jnp.zeros((cap,), bool)
    cell_start = jnp.arange(n_cells, dtype=jnp.int32) * per_cell
    cell_capacity = jnp.full((n_cells,), per_cell, jnp.int32)
    q = jnp.asarray(rng.normal(size=(NQ, D)).astype(np.float32))
    cells = jnp.asarray(
        np.stack([rng.choice(n_cells, n_probe, replace=False)
                  for _ in range(NQ)]).astype(np.int32))
    mask = jnp.ones((NQ, n_probe), bool)
    jax.block_until_ready(decoded)
    print(f"stages: b_max={b_max} s_eff={s_eff} k_pair={k_pair}", flush=True)

    pack = jax.jit(ft.partial(adc._pack_pairs, n_cells=n_cells,
                              p_tile=p_tile, b_max=b_max))
    dt = timeit(lambda: pack(cells, mask))
    print(f"stage pack_pairs (argsort {n_pairs}): {dt:.1f} ms", flush=True)
    order, pair_block, pair_slot, block_cell, probers = pack(cells, mask)

    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)

    @jax.jit
    def prep(block_cell, probers, norms, is_empty):
        cell_all = jnp.maximum(block_cell, 0)
        start_all = cell_start[cell_all]
        cap_all = cell_capacity[cell_all]
        penalty_arr = jnp.where(is_empty, big, norms)
        start_c_all = jnp.clip(start_all, 0, cap - s_eff)
        off_all = start_all - start_c_all
        slot_iota = jnp.arange(s_eff, dtype=jnp.int32)
        bc = 8

        def pen_chunk(args):
            start_c, off, capc = args
            pen = jnp.stack([
                jax.lax.dynamic_slice(penalty_arr, (start_c[i],), (s_eff,))
                for i in range(bc)])
            in_cell = ((slot_iota[None, :] >= off[:, None])
                       & (slot_iota[None, :] < (off + capc)[:, None]))
            return pen + jnp.where(in_cell, 0.0, big)

        nbc = b_max // bc
        pen_all = jax.lax.map(
            pen_chunk, (start_c_all.reshape(nbc, bc),
                        off_all.reshape(nbc, bc),
                        cap_all.reshape(nbc, bc))).reshape(b_max, s_eff)
        return start_c_all, pen_all

    dt = timeit(lambda: prep(block_cell, probers, norms, is_empty))
    print(f"stage pen staging [{b_max}x{s_eff}]: {dt:.1f} ms", flush=True)
    start_c_all, pen_all = prep(block_cell, probers, norms, is_empty)

    @jax.jit
    def qgather(q, probers):
        return q[jnp.maximum(probers, 0)].astype(jnp.bfloat16)

    dt = timeit(lambda: qgather(q, probers))
    print(f"stage qvecs gather [{b_max}x{p_tile}x{D}]: {dt:.1f} ms", flush=True)
    qvecs_p = qgather(q, probers)

    s_pow2 = util.next_pow2(s_eff)
    slot_mask = s_pow2 - 1
    dt = timeit(lambda: scan_blocks_pallas(
        qvecs_p, start_c_all, pen_all, decoded, s_eff=s_eff, k_pair=k_pair,
        p_tile=p_tile, distance="euclidean", approx=True,
        slot_mask=slot_mask))
    print(f"stage kernel [{b_max} blocks]: {dt:.1f} ms", flush=True)
    combo = scan_blocks_pallas(
        qvecs_p, start_c_all, pen_all, decoded, s_eff=s_eff, k_pair=k_pair,
        p_tile=p_tile, distance="euclidean", approx=True, slot_mask=slot_mask)

    key_neg_big = adc._f32_sortable_i32(-big) & jnp.int32(~slot_mask)
    merge = jax.jit(ft.partial(
        adc._merge_pairs, b_max=b_max, p_tile=p_tile, k=K, k_pair=k_pair,
        nq=NQ, n_probe=n_probe, pack32=True, slot_mask=slot_mask,
        key_neg_big=key_neg_big, distance="euclidean", big=big))
    dt = timeit(lambda: merge(combo, q, order, pair_block, pair_slot,
                              start_c_all))
    print(f"stage merge: {dt:.1f} ms", flush=True)

    @jax.jit
    def reduce_out(vals, addr):
        return jnp.sum(vals) + jnp.sum(addr).astype(jnp.float32)

    dt = timeit(lambda: reduce_out(*adc.scan_cell_major(
        q, cells, mask, decoded, norms, is_empty, cell_start, cell_capacity,
        k=K, distance="euclidean", s_max=per_cell, n_cells=n_cells,
        p_tile=p_tile, approx=True, impl="pallas")))
    print(f"full scan_cell_major np={n_probe}: {dt:.1f} ms", flush=True)


if __name__ == "__main__" and which in ("all", "stages"):
    bench_stages()
