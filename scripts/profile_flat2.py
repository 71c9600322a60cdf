"""Flat-sweep epilogue experiments at the compacted 1M shape.

The live-row-compacted flat scan (ops/flat_adc.py) runs 26.5 ms per
10k-query batch at 1M x 128d — ~2x the pure-matmul roofline (~13 ms of
bf16 MXU work). This script measures where the other half goes and
whether any cheap variant closes the gap:

  A. chunk-size sweep {64k, 128k, 256k} at the compacted size
     (the recorded sweep in /tmp/micro_flat.out predates compaction);
  B. bf16 score output (halves the score matrix's HBM bytes if XLA is
     materializing it rather than fusing the PartialReduce epilogue);
  C. matmul-only / epilogue-only splits for an exact attribution.

Run on the real TPU chip (holds the TPU for ~2 min):
  /opt/venv/bin/python scripts/profile_flat2.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_cache_dir = os.path.expanduser("~/.cache/torchpq_tpu_jax")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NQ, N, D, K = 10_000, 1_000_000, 128, 10


def _barrier(out):
    # on this remote backend block_until_ready returns before execution
    # finishes; a D2H read of one element is the only reliable barrier
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[0, :1])


def timed(fn, *args, repeats=5):
    out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
        _barrier(out)
    return (time.perf_counter() - t0) / repeats


@functools.partial(jax.jit, static_argnames=("k", "chunk", "sdtype", "mode"))
def sweep(q, cache, pen, *, k, chunk, sdtype, mode="full"):
    nq, d = q.shape
    cap = cache.shape[0]
    n_chunks = cap // chunk

    def one(c0):
        block = jax.lax.dynamic_slice(cache, (c0, 0), (chunk, d))
        p = jax.lax.dynamic_slice(pen, (c0,), (chunk,))
        ab = jax.lax.dot_general(q, block, (((1,), (1,)), ((), ())),
                                 preferred_element_type=sdtype)
        s = 2.0 * ab - p[None, :].astype(sdtype)
        if mode == "mm_only":
            return jnp.sum(s, axis=-1), jnp.zeros((nq, k), jnp.int32)[:, :k]
        v, i = jax.lax.approx_max_k(s, k)
        return v.astype(jnp.float32), (i + c0).astype(jnp.int32)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    vals, idx = jax.lax.map(one, starts)
    if mode == "mm_only":
        return vals
    vals = jnp.moveaxis(vals, 0, 1).reshape(nq, n_chunks * k)
    idx = jnp.moveaxis(idx, 0, 1).reshape(nq, n_chunks * k)
    fv, fi = jax.lax.top_k(vals, k)
    return fv, jnp.take_along_axis(idx, fi, axis=1)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((NQ, D), np.float32), jnp.bfloat16)
    cache = jnp.asarray(rng.standard_normal((N, D), np.float32),
                        jnp.bfloat16)
    pen = jnp.asarray(rng.standard_normal((N,), np.float32) ** 2)
    jax.block_until_ready((q, cache, pen))

    base = None
    for chunk in (65536, 131072, 262144):
        for sdtype in (jnp.float32, jnp.bfloat16):
            ms = timed(lambda a, b, c: sweep(a, b, c, k=K, chunk=chunk,
                                             sdtype=sdtype), q, cache,
                       pen) * 1e3
            tag = f"chunk={chunk:>6} s_dtype={jnp.dtype(sdtype).name}"
            print(f"{tag}: {ms:6.1f} ms -> {NQ / ms * 1e3:>9,.0f} q/s",
                  flush=True)
            if base is None:
                base = ms
    ms = timed(lambda a, b, c: sweep(a, b, c, k=K, chunk=131072,
                                     sdtype=jnp.float32, mode="mm_only"),
               q, cache, pen) * 1e3
    print(f"mm_only (chunk=131072, f32 scores, sum epilogue): {ms:6.1f} ms",
          flush=True)

    # agreement check: bf16 scores vs f32 scores (top-10 overlap)
    _, a32 = sweep(q, cache, pen, k=K, chunk=131072, sdtype=jnp.float32)
    _, a16 = sweep(q, cache, pen, k=K, chunk=131072, sdtype=jnp.bfloat16)
    a32, a16 = np.asarray(a32), np.asarray(a16)
    ov = np.mean([len(np.intersect1d(x, y)) / K for x, y in zip(a32, a16)])
    print(f"bf16-score top-{K} overlap vs f32-score: {ov:.4f}", flush=True)


if __name__ == "__main__":
    main()
