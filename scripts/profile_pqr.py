"""Stage-level profile of the IVFPQR rescore + base-search k-dependence.

Round-2 recorded IVFPQR at 34.1k q/s (k=10) and 3.9k q/s (k=100)
(benchmark/results/ivf4096_pq64r32_sift1m_pqr.json) — ~10x off the base
scan. VERDICT r2 #3 asks for >= 150k / 20k. This isolates where the time
goes and A/Bs the candidate fixes on synthetic arrays (the rescore's cost
depends only on nq*k', not on index contents):

  part A (synthetic, cap=1.25M):
    - storage/rerank code gathers
    - base/rerank one-hot decodes (current _decode_nd fast path)
    - fused single-one-hot decode of base+rerank together
    - score+topk epilogue
    - the full current _rerank_from_codes
    - LUT variant: per-query ADC inner-product tables + take_along_axis
      lookups + stored ||y||^2 (no decode at all)
    - cache-dot variant: gather bf16 decoded-cache rows, decode only the
      rerank codes

  part B (real 1M index state): IVFPQIndex.search at k=10/40/100/400 —
    IVFPQR's base scan runs at k_base = 4*k, so its speed rides the k>32
    path (flat exact epilogue / k_pair=64 merges).
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

from torchpq_tpu.index.ivfpqr import _rerank_from_codes
from torchpq_tpu.codec.pq import _decode_nd
from torchpq_tpu.ops.adc import _block_scores, build_adc_table
from torchpq_tpu import util

NQ, D, M, DSUB, MR, DSUBR, CAP = 10_000, 128, 64, 2, 32, 4, 1_250_000


def timeit(f, *a, reps=5):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


import functools


@functools.partial(jax.jit, static_argnames=("m", "dsub", "mr", "dsubr"))
def _fused_decode(codes, rcodes, bd_comb, *, m, dsub, mr, dsubr):
    """One one-hot matmul decoding base+rerank *summed*: block matrix
    [(m+mr)*256, d] whose base rows hit columns [i*dsub,(i+1)*dsub) and
    rerank rows hit [j*dsubr,(j+1)*dsubr)."""
    n = codes.shape[0]
    mm = m + mr
    cc = jnp.concatenate([codes, rcodes], axis=1).astype(jnp.int32)
    sub = 4096
    cvals = jnp.arange(256, dtype=jnp.int32)

    def one(c):
        oh = (c[:, :, None] == cvals[None, None, :]).astype(jnp.bfloat16)
        return jnp.dot(oh.reshape(sub, mm * 256), bd_comb,
                       preferred_element_type=jnp.float32)

    n_pad = util.round_up(n, sub)
    cp = jnp.pad(cc, ((0, n_pad - n), (0, 0)))
    out = jax.lax.map(one, cp.reshape(n_pad // sub, sub, mm))
    return out.reshape(n_pad, -1)[:n]


def make_bd_comb(cb, rcb):
    d = M * DSUB
    bd = np.zeros((M + MR, 256, d), np.float32)
    for i in range(M):
        bd[i, :, i * DSUB:(i + 1) * DSUB] = np.asarray(cb[i])
    for j in range(MR):
        bd[M + j, :, j * DSUBR:(j + 1) * DSUBR] = np.asarray(rcb[j])
    return jnp.asarray(bd.reshape((M + MR) * 256, d), jnp.bfloat16)


@jax.jit
def _lut_rescore(q, cand_addr, storage, rerank_codes, norm2, cb, rcb):
    """ADC-LUT rescore: score = 2*(q.b + q.r) - ||b+r||^2 (+rank-invariant
    -|q|^2 dropped). Lookup from per-query inner-product tables."""
    lut_b = build_adc_table(q, cb, "inner")        # [nq, m, 256]
    lut_r = build_adc_table(q, rcb, "inner")       # [nq, mr, 256]
    lut = jnp.concatenate([lut_b, lut_r], axis=1)  # [nq, m+mr, 256]
    nq, kp = cand_addr.shape
    valid = cand_addr >= 0
    safe = jnp.where(valid, cand_addr, 0)
    flat = safe.reshape(-1)
    cc = jnp.concatenate([storage[flat], rerank_codes[flat]],
                         axis=1).astype(jnp.int32)          # [nq*kp, mm]
    mm = cc.shape[1]
    offs = (jnp.arange(mm, dtype=jnp.int32) * 256)[None, :]
    idx = (cc + offs).reshape(nq, kp * mm)
    lut_flat = lut.reshape(nq, mm * 256)
    got = jnp.take_along_axis(lut_flat, idx, axis=1).reshape(nq, kp, mm)
    ip = jnp.sum(got, axis=-1)
    sims = 2.0 * ip - norm2[flat].reshape(nq, kp)
    sims = jnp.where(valid, sims, -jnp.inf)
    vals, i = jax.lax.top_k(sims, 10)
    return vals, jnp.take_along_axis(cand_addr, i, axis=1)


@jax.jit
def _cachedot_rescore(q, cand_addr, cache, rerank_codes, norm2, rcb):
    """Gather decoded-cache rows (bf16), decode only rerank codes, score
    2*q.(cache+rr) - norm2."""
    nq, kp = cand_addr.shape
    valid = cand_addr >= 0
    safe = jnp.where(valid, cand_addr, 0)
    flat = safe.reshape(-1)
    dec = cache[flat].astype(jnp.float32)
    dec = dec + _decode_nd(rerank_codes[flat], rcb, m=MR, dsub=DSUBR,
                           fast=True)
    cand = dec.reshape(nq, kp, -1)
    ip = jnp.einsum("qd,qkd->qk", q, cand,
                    preferred_element_type=jnp.float32)
    sims = 2.0 * ip - norm2[flat].reshape(nq, kp)
    sims = jnp.where(valid, sims, -jnp.inf)
    vals, i = jax.lax.top_k(sims, 10)
    return vals, jnp.take_along_axis(cand_addr, i, axis=1)


@jax.jit
def _gather_codes(storage, rerank_codes, flat):
    return storage[flat], rerank_codes[flat]


@jax.jit
def _score_topk(q, dec, cand_addr):
    nq, kp = cand_addr.shape
    cand = dec.reshape(nq, kp, -1)
    cand_sq = jnp.sum(jnp.square(dec), axis=-1).reshape(nq, kp)
    sims = _block_scores(q[:, None, :], cand, cand_sq, "euclidean")[:, 0, :]
    vals, i = jax.lax.top_k(sims, 10)
    return vals, jnp.take_along_axis(cand_addr, i, axis=1)


def part_a():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    storage = jax.random.randint(ks[0], (CAP, M), 0, 256, jnp.uint8)
    rerank = jax.random.randint(ks[1], (CAP, MR), 0, 256, jnp.uint8)
    cb = jax.random.normal(ks[2], (M, 256, DSUB), jnp.float32)
    rcb = jax.random.normal(ks[3], (MR, 256, DSUBR), jnp.float32) * 0.3
    cache = jax.random.normal(ks[4], (CAP, D), jnp.bfloat16)
    norm2 = jax.random.uniform(ks[5], (CAP,), jnp.float32)
    q = jax.random.normal(ks[6], (NQ, D), jnp.float32)
    cell_start = jnp.arange(0, CAP, CAP // 4096, dtype=jnp.int32)[:4096]
    is_empty = jnp.zeros((CAP,), bool)
    bd_comb = make_bd_comb(cb, rcb)
    decode_b = jax.jit(lambda c: _decode_nd(c, cb, m=M, dsub=DSUB, fast=True))
    decode_r = jax.jit(lambda c: _decode_nd(c, rcb, m=MR, dsub=DSUBR,
                                            fast=True))
    fused = jax.jit(lambda c, r: _fused_decode(c, r, bd_comb, m=M, dsub=DSUB,
                                               mr=MR, dsubr=DSUBR))

    for kp in (40, 400):
        cand = jax.random.randint(ks[7], (NQ, kp), 0, CAP, jnp.int32)
        flat = cand.reshape(-1)
        print(f"--- k'={kp} (nq={NQ}) ---", flush=True)
        dt = timeit(_gather_codes, storage, rerank, flat)
        print(f"  gather codes+rerank ({NQ*kp*(M+MR)/1e6:.0f} MB): "
              f"{dt:.1f} ms", flush=True)
        codes, rcodes = _gather_codes(storage, rerank, flat)
        dt = timeit(decode_b, codes)
        print(f"  decode base (one-hot bf16): {dt:.1f} ms", flush=True)
        dt = timeit(decode_r, rcodes)
        print(f"  decode rerank: {dt:.1f} ms", flush=True)
        dt = timeit(fused, codes, rcodes)
        print(f"  fused decode (base+rerank one matmul): {dt:.1f} ms",
              flush=True)
        dec = decode_b(codes) + decode_r(rcodes)
        dt = timeit(_score_topk, q, dec, cand)
        print(f"  score+topk epilogue: {dt:.1f} ms", flush=True)
        f_full = lambda: _rerank_from_codes(
            q, cand, storage, rerank, cell_start, cb, rcb, None, is_empty,
            k=10, distance="euclidean", residual=False, m=M, dsub=DSUB,
            mr=MR, dsubr=DSUBR)
        dt = timeit(f_full)
        print(f"  FULL current rescore: {dt:.1f} ms -> {NQ/dt*1e3:,.0f} q/s",
              flush=True)
        dt = timeit(_lut_rescore, q, cand, storage, rerank, norm2, cb, rcb)
        print(f"  LUT variant: {dt:.1f} ms -> {NQ/dt*1e3:,.0f} q/s",
              flush=True)
        dt = timeit(_cachedot_rescore, q, cand, cache, rerank, norm2, rcb)
        print(f"  cache-dot variant: {dt:.1f} ms -> {NQ/dt*1e3:,.0f} q/s",
              flush=True)


def part_b():
    from bench import make_data
    from torchpq_tpu.index import IVFPQIndex
    n_base, n_cells = 1_000_000, 4096
    base, query = make_data(n_base, NQ, D, spectrum="manifold-12")
    index = IVFPQIndex(d_vector=D, n_subvectors=M, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 2)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    state = "/tmp/profile_1m_state.npz"
    t0 = time.perf_counter()
    if os.path.exists(state):
        index.load(state)
    else:
        index.train(jnp.asarray(base[:100_000]).T)
        for i in range(0, n_base, 250_000):
            index.add(jnp.asarray(base[i:i + 250_000]).T)
        index.save(state)
    print(f"state ready in {time.perf_counter() - t0:.0f}s "
          f"s_max={index.max_cell_capacity}", flush=True)
    qj = jnp.asarray(query.T)
    for mode, npb, impl in (("flat", 1, "xla"), ("cell_major", 32, "pallas"),
                            ("cell_major", 32, "xla")):
        index.scan_mode = mode
        index.scan_impl = impl
        index.scan_group = 4
        index.n_probe = npb
        for k in (10, 40, 100, 400):
            try:
                f = lambda: index.search(qj, k=k)
                dt = timeit(f, reps=3)
                print(f"  base search mode={mode} np={npb} impl={impl} "
                      f"k={k}: {dt:.1f} ms -> {NQ/dt*1e3:,.0f} q/s",
                      flush=True)
            except Exception as e:
                print(f"  mode={mode} k={k} impl={impl} FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if "a" in which:
        print("== part A: synthetic rescore stages ==", flush=True)
        part_a()
    if "b" in which:
        print("== part B: base-search k dependence (1M) ==", flush=True)
        part_b()
