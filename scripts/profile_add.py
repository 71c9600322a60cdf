"""Stage-level breakdown of IVFPQIndex.add (warm) at the 1M benchmark shape.

Stages per 250k chunk: host transpose+H2D, coarse assign (+spill), PQ encode,
PQ decode + norms, container scatter (_cell_add + aux scatters).
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

from bench import make_data
from torchpq_tpu.index import IVFPQIndex


def t(label, f, barrier=True):
    t0 = time.perf_counter()
    r = f()
    if barrier:
        jax.block_until_ready(r) if r is not None else jax.effects_barrier()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt * 1e3:.0f} ms", flush=True)
    return r


def main():
    n_base, d, n_cells, m = 1_000_000, 128, 4096, 64
    base, _ = make_data(n_base, 100, d)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 3)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    index.train(jnp.asarray(base[:100_000]).T)
    print("trained", flush=True)

    # warm all programs with the first two chunks
    for i in range(2):
        index.add(jnp.asarray(base[i * 250_000:(i + 1) * 250_000]).T)
    print("warmed", flush=True)

    chunk = base[500_000:750_000]

    # raw link rates (the axon tunnel may be ~MB/s, unlike production PCIe)
    blob = np.ones((64, 1 << 19), np.float32)  # 128 MB
    t0 = time.perf_counter()
    dev = jnp.asarray(blob)
    jax.block_until_ready(dev)
    dt = time.perf_counter() - t0
    print(f"  H2D 128MB: {dt * 1e3:.0f} ms ({128 / dt:.0f} MB/s)", flush=True)
    t0 = time.perf_counter()
    _ = np.asarray(dev)
    dt = time.perf_counter() - t0
    print(f"  D2H 128MB: {dt * 1e3:.0f} ms ({128 / dt:.0f} MB/s)", flush=True)

    x = t("h2d+T", lambda: jnp.asarray(chunk).T.astype(jnp.float32))
    x_nd = x.T
    cells = t("assign(spill)", lambda: index._assign_cells(x), barrier=False)
    codes_nm = t("pq encode", lambda: index.pq_codec.encode_nd(x_nd))
    decoded = t("pq decode", lambda: index.pq_codec.decode_nd(codes_nm))
    norms = t("norms", lambda: jnp.sum(jnp.square(decoded), axis=-1,
                                       keepdims=True))
    t("container add", lambda: super(IVFPQIndex, index).add(
        codes_nm.T, cells, aux_rows={"norm": norms, "decoded": decoded}),
      barrier=False)
    jax.effects_barrier()

    # and the whole thing, warm, for the last chunk
    last = base[750_000:]
    t0 = time.perf_counter()
    index.add(jnp.asarray(last).T)
    jax.effects_barrier()
    print(f"  full add(250k) warm: {(time.perf_counter() - t0) * 1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
