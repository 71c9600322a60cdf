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
