"""Microbenchmark the fused block-scan kernel on synthetic packed inputs.

No index build: random decoded cache + random (16-aligned) window starts at
the 1M bench shape, so kernel variants iterate in seconds. Derives
microseconds/block — the scan's governing figure (block count has a floor of
~n_cells whenever pairs >= cells).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from torchpq_tpu.ops.pallas_scan import scan_blocks_pallas


def timeit(f, reps=10):
    # block_until_ready is NOT a reliable barrier over the axon tunnel —
    # fetch a device-reduced scalar (D2H) to force execution (CLAUDE.md).
    chk = int(jnp.sum(f().astype(jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    chk ^= int(jnp.sum(r.astype(jnp.int32)))
    dt = (time.perf_counter() - t0) / reps * 1e3
    return dt, chk


def main():
    cap, d = 2_097_152, 128
    rng = np.random.default_rng(0)
    decoded = jnp.asarray(
        rng.normal(size=(cap, d)).astype(np.float32), jnp.bfloat16)
    for b, p_tile, s_eff, k_pair in [
            (6600, 128, 512, 10),
            (6600, 128, 512, 4),
            (6600, 128, 512, 1),
            (3300, 256, 512, 10),
            (6600, 128, 256, 10),
            (4100, 8, 512, 10),
            (4100, 32, 512, 10),
    ]:
        starts = jnp.asarray(
            (rng.integers(0, (cap - s_eff) // 16, size=b) * 16)
            .astype(np.int32))
        pen = jnp.asarray(
            rng.normal(size=(b, s_eff)).astype(np.float32))
        qvecs = jnp.asarray(
            rng.normal(size=(b, p_tile, d)).astype(np.float32),
            jnp.bfloat16)

        def f():
            return scan_blocks_pallas(
                qvecs, starts, pen, decoded, s_eff=s_eff, k_pair=k_pair,
                p_tile=p_tile, distance="euclidean", approx=True,
                slot_mask=s_eff - 1)

        dt, chk = timeit(f)
        print(f"b={b} p={p_tile} s={s_eff} k={k_pair}: {dt:.1f} ms "
              f"({dt / b * 1e3:.2f} us/block) [chk={chk & 0xffff:04x}]",
              flush=True)


if __name__ == "__main__":
    main()
