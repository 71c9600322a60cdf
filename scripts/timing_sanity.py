"""Timing-methodology sanity check for the axon remote TPU backend.

Question: do repeated identical jitted calls re-execute, and does
jax.block_until_ready actually wait? Compares, for the flat-sweep core
(one [10k,128]x[128,1M] bf16 matmul + approx_max_k):

  A. 5 identical calls, block_until_ready once at the end
  B. 5 calls with 5 distinct query arrays, block at the end
  C. 5 identical calls, 1-element D2H after each
  D. 5 distinct-query calls, 1-element D2H after each

If A << B: identical calls are memoized and every bench timed on
identical inputs is inflated. If C >> B: the D2H barrier adds tunnel
round-trip latency and per-call D2H over-measures. Ground truth for one
call ~= B/5 if A==B==C==D disagree only by noise.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/torchpq_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NQ, N, D, K = 10_000, 1_000_000, 128, 10


@jax.jit
def core(q, cache):
    s = jax.lax.dot_general(q, cache, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.lax.approx_max_k(s, K)[0]


def main():
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.standard_normal((N, D), np.float32),
                        jnp.bfloat16)
    qs = [jnp.asarray(rng.standard_normal((NQ, D), np.float32),
                      jnp.bfloat16) for _ in range(5)]
    np.asarray(core(qs[0], cache)[0, :1])  # compile + settle

    t0 = time.perf_counter()
    out = None
    for _ in range(5):
        out = core(qs[0], cache)
    jax.block_until_ready(out)
    print(f"A identical x5, block at end : {(time.perf_counter()-t0)/5*1e3:7.1f} ms")

    t0 = time.perf_counter()
    for i in range(5):
        out = core(qs[i], cache)
    jax.block_until_ready(out)
    print(f"B distinct  x5, block at end : {(time.perf_counter()-t0)/5*1e3:7.1f} ms")

    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(core(qs[0], cache)[0, :1])
    print(f"C identical x5, D2H each     : {(time.perf_counter()-t0)/5*1e3:7.1f} ms")

    t0 = time.perf_counter()
    for i in range(5):
        np.asarray(core(qs[i], cache)[0, :1])
    print(f"D distinct  x5, D2H each     : {(time.perf_counter()-t0)/5*1e3:7.1f} ms")

    # E: one dispatch, then block — is block_until_ready a real wait?
    t0 = time.perf_counter()
    out = core(qs[1], cache)
    t1 = time.perf_counter()
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    np.asarray(out[0, :1])
    t3 = time.perf_counter()
    print(f"E dispatch {1e3*(t1-t0):.1f} ms | block {1e3*(t2-t1):.1f} ms | "
          f"D2H-after-block {1e3*(t3-t2):.1f} ms")


if __name__ == "__main__":
    main()
