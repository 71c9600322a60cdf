"""Multi-chip demo: cell-sharded search + ingestion + removal and
data-parallel k-means over a jax.sharding.Mesh.

Runs on real TPU chips or, for trying it anywhere, on a virtual CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip_demo.py --cpu

The reference library is single-GPU (SURVEY.md §2: no distributed
backend); this is the capability the TPU build adds natively: IVF cells
shard round-robin over the mesh, codebooks and queries replicate, each
chip scans its own cells, and per-chip top-k merges with one all-gather
over ICI.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--n-cells", type=int, default=64)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torchpq_tpu.index import IVFPQIndex
    from torchpq_tpu.parallel import (get_mesh, ShardedIVFPQSearcher,
                                      data_parallel_kmeans_fit)

    mesh = get_mesh()
    print(f"mesh: {mesh.devices.size} devices ({mesh.devices.ravel()[0].platform})")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((args.n, args.d)).astype(np.float32)

    # 1. data-parallel k-means: rows shard over the mesh, one psum/iter
    cents, iters = data_parallel_kmeans_fit(x, 32, mesh=mesh, max_iter=10)
    print(f"dp k-means: {iters} iters, centroids {cents.shape}")

    # 2. build a single-chip index, then shard it over the mesh
    index = IVFPQIndex(d_vector=args.d, n_subvectors=8,
                       n_cells=args.n_cells,
                       initial_size=4 * args.n // args.n_cells)
    index.train(jnp.asarray(x[: args.n // 2].T))
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    index.n_probe = 16
    searcher = ShardedIVFPQSearcher(index, mesh=mesh)

    q = x[:256]
    vals, got = searcher.search(jnp.asarray(q.T), k=10)
    self_recall = (np.asarray(got)[:, 0] == ids[:256]).mean()
    print(f"sharded search: self-recall@1 {self_recall:.3f}")

    # 3. live mutation on the mesh: add a new batch, remove an old one
    y = rng.standard_normal((1000, args.d)).astype(np.float32)
    new_ids = np.asarray(searcher.add(jnp.asarray(y.T)))
    removed = searcher.remove(ids[:1000])
    _, got_new = searcher.search(jnp.asarray(y[:256].T), k=1)
    add_recall = (np.asarray(got_new)[:, 0] == new_ids[:256]).mean()
    print(f"sharded add/remove: +{len(new_ids)} vectors, -{removed}; "
          f"new-vector self-recall@1 {add_recall:.3f}")

    # 4. the max-recall operating point: every chip sweeps its local cells
    searcher.scan_mode = "flat"
    _, got_flat = searcher.search(jnp.asarray(y[:256].T), k=1)
    flat_recall = (np.asarray(got_flat)[:, 0] == new_ids[:256]).mean()
    print(f"sharded flat sweep: self-recall@1 {flat_recall:.3f}")


if __name__ == "__main__":
    main()
