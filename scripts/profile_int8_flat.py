"""Re-measure the int8 flat sweep at the single-chunk shape.

The earlier int8-vs-bf16 flat measurement (ARCHITECTURE.md "failed
alternatives") predates the single-chunk change: with chunked sweeps the
epilogue dominated and halving matmul width didn't move the total. With
one full-width chunk XLA fuses the approx-top-k epilogue differently, so
int8's 2x MXU throughput (and half the cache HBM bytes) may now be
visible. This script times flat_adc_scan at the compacted 1M bench shape
for bf16 and int8 caches, k in {10, 100}.

Run on the real TPU chip (holds it for ~3 min incl. compiles):
  /opt/venv/bin/python scripts/profile_int8_flat.py
"""

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

from torchpq_tpu.ops.flat_adc import flat_adc_scan

NQ, N, D = 10_000, 1_000_000, 128


def _barrier(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, :1])


def timed(fn, repeats=5):
    out = fn()
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        _barrier(fn())
    return (time.perf_counter() - t0) / repeats


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((NQ, D), np.float32))
    dec_f32 = rng.standard_normal((N, D), np.float32).astype(np.float32)
    pen = jnp.asarray((dec_f32 ** 2).sum(1))
    dec_bf16 = jnp.asarray(dec_f32, jnp.bfloat16)
    absmax = np.maximum(np.abs(dec_f32).max(1, keepdims=True), 1e-12)
    scales = jnp.asarray((absmax / 127.0)[:, 0])
    dec_i8 = jnp.asarray(np.round(dec_f32 / (absmax / 127.0)), jnp.int8)

    gt10 = None
    for k in (10, 100):
        for name, dec, sc in (("bf16", dec_bf16, None),
                              ("int8", dec_i8, scales)):
            dt = timed(lambda: flat_adc_scan(
                q, dec, pen, k=k, distance="euclidean", chunk=N,
                approx=True, scales=sc))
            v, a = flat_adc_scan(q, dec, pen, k=k, distance="euclidean",
                                 chunk=N, approx=True, scales=sc)
            a = np.asarray(a)
            if k == 10:
                if name == "bf16":
                    gt10 = a
                    overlap = 1.0
                else:
                    overlap = np.mean([
                        len(set(a[i]) & set(gt10[i])) / 10
                        for i in range(0, NQ, 37)])
                print(f"k={k} {name}: {dt * 1e3:7.1f} ms "
                      f"({NQ / dt:,.0f} q/s)  top10-vs-bf16 {overlap:.4f}")
            else:
                print(f"k={k} {name}: {dt * 1e3:7.1f} ms "
                      f"({NQ / dt:,.0f} q/s)")


if __name__ == "__main__":
    main()
