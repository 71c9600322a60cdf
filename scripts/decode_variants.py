"""Measure PQ decode variants at rebuild scale (1M x m64 x dsub2).

The take_along_axis decode materializes a [n*m, dsub] f32 intermediate that
TPU tiling pads to 128 lanes (64x waste at dsub=2) — at the 1M rebuild chunk
that is a 32 GB allocation and the compile aborts. Candidates:

  a) current: take_along_axis axis=2 with trailing dsub
  b) lane-major gather: [m, dsub, n] take + transpose back to [n, d]
  c) one-hot matmul: [n, m*256] one-hot @ blockdiag codebook -> [n, d]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from torchpq_tpu import util


def timeit(f, *a, reps=3):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


m, dsub, n = 64, 2, 1_000_000
d = m * dsub
rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 256, size=(n, m), dtype=np.uint8))
cb = jnp.asarray(rng.normal(size=(m, 256, dsub)).astype(np.float32))


@jax.jit
def dec_a(codes, cb):
    g = jnp.take_along_axis(
        cb[None], codes.astype(jnp.int32)[:, :, None, None], axis=2)
    return g.reshape(n, m * dsub)


@jax.jit
def dec_b(codes, cb):
    cb_t = jnp.swapaxes(cb, 1, 2)  # [m, dsub, 256]
    idx = codes.T.astype(jnp.int32)[:, None, :]  # [m, 1, n]
    idx = jnp.broadcast_to(idx, (m, dsub, n))
    g = jnp.take_along_axis(cb_t, idx, axis=2)  # [m, dsub, n]
    return g.reshape(m * dsub, n).T


@jax.jit
def dec_c(codes, cb):
    # block-diagonal one-hot matmul; sub-chunk to bound the one-hot buffer
    bd = jnp.zeros((m, 256, m, dsub), jnp.float32)
    bd = bd.at[jnp.arange(m), :, jnp.arange(m), :].set(cb)
    bd = bd.reshape(m * 256, d).astype(jnp.bfloat16)  # [16384, d]
    sub = 4096
    cvals = jnp.arange(256, dtype=jnp.uint8)

    def one(c):  # c: [sub, m]
        oh = (c[:, :, None] == cvals[None, None, :]).astype(jnp.bfloat16)
        return jnp.dot(oh.reshape(sub, m * 256), bd,
                       preferred_element_type=jnp.float32)

    n_pad = util.round_up(n, sub)
    cp = jnp.pad(codes, ((0, n_pad - n), (0, 0)))
    blocks = cp.reshape(n_pad // sub, sub, m)
    return jax.lax.map(one, blocks).reshape(n_pad, d)[:n]


# host-side oracle for the first rows
codes_h = np.asarray(codes[:1000])
cb_h = np.asarray(cb)
ref = np.concatenate([cb_h[i, codes_h[:, i], :] for i in range(m)],
                     axis=1).reshape(1000, m, dsub).reshape(1000, d)

for name, f in [("b_lane_major", dec_b), ("c_onehot", dec_c),
                ("a_current", dec_a)]:
    try:
        dt = timeit(f, codes, cb)
        out = np.asarray(f(codes, cb)[:1000])
        ok = np.allclose(out, ref, atol=2e-2)
        print(f"{name}: {dt:.1f} ms  sane={ok}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)


@jax.jit
def dec_c32(codes, cb):
    bd = jnp.zeros((m, 256, m, dsub), jnp.float32)
    bd = bd.at[jnp.arange(m), :, jnp.arange(m), :].set(cb)
    bd = bd.reshape(m * 256, d)
    sub = 4096
    cvals = jnp.arange(256, dtype=jnp.uint8)

    def one(c):
        oh = (c[:, :, None] == cvals[None, None, :]).astype(jnp.float32)
        return jnp.dot(oh.reshape(sub, m * 256), bd,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    n_pad = util.round_up(n, sub)
    cp = jnp.pad(codes, ((0, n_pad - n), (0, 0)))
    blocks = cp.reshape(n_pad // sub, sub, m)
    return jax.lax.map(one, blocks).reshape(n_pad, d)[:n]


if os.environ.get("EXACT_CHECK"):
    dt = timeit(dec_c32, codes, cb)
    g32 = np.asarray(dec_c32(codes, cb)[:20000])
    gb = np.asarray(dec_b(codes, cb)[:20000])
    print(f"c32_onehot_highest: {dt:.1f} ms  bitexact_vs_gather="
          f"{np.array_equal(g32, gb)}  maxdiff={np.abs(g32-gb).max()}",
          flush=True)
    gc = np.asarray(dec_c(codes, cb)[:20000])
    print(f"c_bf16 maxdiff vs gather: {np.abs(gc-gb).max()}", flush=True)
