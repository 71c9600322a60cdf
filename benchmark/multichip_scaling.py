"""Multi-chip weak-scaling shape on the virtual CPU mesh (VERDICT §7).

Real multi-chip hardware is unavailable in this environment, so this
measures what CAN be measured without it and states the ICI projection
explicitly:

* weak scaling D=1,2,4,8 with FIXED per-shard load — on one host core the
  D virtual devices serialize, so ideal weak scaling shows total wall time
  ~ D x the per-shard time with a flat per-shard-normalized time t(D)/D;
  growth of t(D)/D with D is the sharding overhead (merge + dispatch),
  which is the quantity of interest;
* the ICI merge program (all_gather [nq, k] + local re-top-k) timed in
  isolation at the same shapes — on real hardware this is the ONLY
  cross-chip component of a sharded search, and its wire cost is
  analytically bounded: each chip receives (D-1) * nq * k * 12 B
  (f32 value + int64 id); at v5e's ~45 GB/s/link ICI that is ~0.02 ms for
  D=8, nq=10k, k=10 vs a measured ~40 ms single-chip probed scan
  (ARCHITECTURE.md) — under 0.1% of search time, which is why cell
  sharding scales capacity ~D at near-constant QPS per query batch.

Writes benchmark/results/multichip_scaling.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.parallel import ShardedIVFPQSearcher


def timeit(fn, reps=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def merge_program(mesh, axis, nq, k):
    """The sharded search's ICI merge in isolation: all_gather the
    per-shard [nq, k] partials + local re-top-k (sharded_ivfpq.py:102-109)."""
    from jax import shard_map

    def local(v, i):
        # v, i: the local [nq, k] partials of this shard
        gv = jax.lax.all_gather(v, axis)
        gi = jax.lax.all_gather(i, axis)
        gv = jnp.moveaxis(gv, 0, 1).reshape(nq, -1)
        gi = jnp.moveaxis(gi, 0, 1).reshape(nq, -1)
        fv, fi = jax.lax.top_k(gv, k)
        return fv, jnp.take_along_axis(gi, fi, axis=1)

    return jax.jit(shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                             out_specs=(P(), P()), check_vma=False))


def main():
    d, m, nq, k = 64, 16, 512, 10
    cells_per_shard, per_cell = 64, 256
    n_probe = 8
    rng = np.random.default_rng(0)
    out = {"config": {"d": d, "m": m, "nq": nq, "k": k,
                      "cells_per_shard": cells_per_shard,
                      "per_cell": per_cell, "n_probe": n_probe,
                      "backend": "virtual CPU mesh (1 host core)"},
           "weak_scaling": []}
    q = jnp.asarray(rng.standard_normal((d, nq)).astype(np.float32))

    for D in (1, 2, 4, 8):
        devs = jax.devices()[:D]
        mesh = Mesh(np.array(devs), ("shards",))
        n_cells = cells_per_shard * D
        n = n_cells * per_cell // 2  # half-full cells, fixed load PER SHARD
        x = rng.standard_normal((d, n)).astype(np.float32)
        index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                           initial_size=per_cell)
        index.train(jnp.asarray(x[:, :40_000] if n > 40_000 else x))
        index.add(jnp.asarray(x))
        index.n_probe = n_probe
        sr = ShardedIVFPQSearcher(index, mesh=mesh)
        t_search = timeit(lambda: sr.search(q, k=k))
        # merge in isolation at the exact shapes the search gathers
        vloc = jnp.asarray(rng.standard_normal((D, nq, k)).astype(np.float32))
        iloc = jnp.asarray(rng.integers(0, n, size=(D, nq, k)))
        mp = merge_program(mesh, "shards", nq, k)
        t_merge = timeit(lambda: mp(vloc.reshape(D * nq, k),
                                    iloc.reshape(D * nq, k)))
        row = {"D": D, "n_items": n,
               "search_ms": round(t_search * 1e3, 2),
               "search_ms_per_shard": round(t_search * 1e3 / D, 2),
               "merge_ms": round(t_merge * 1e3, 3)}
        out["weak_scaling"].append(row)
        print(row, flush=True)

    # ICI projection for real hardware (stated model, not a measurement)
    nq_p, k_p = 10_000, 10
    bytes_per_chip = 7 * nq_p * k_p * 12  # (D-1)=7 partials of (f32+i64)
    out["ici_projection"] = {
        "model": "all_gather wire bytes per chip = (D-1)*nq*k*12B",
        "D": 8, "nq": nq_p, "k": k_p,
        "bytes_per_chip": bytes_per_chip,
        "ici_gbps_assumed": 45.0,
        "merge_wire_ms": round(bytes_per_chip / 45e9 * 1e3, 4),
        "single_chip_probed_scan_ms_np32": 40.1,
        "merge_share_pct": round(
            bytes_per_chip / 45e9 * 1e3 / 40.1 * 100, 3),
    }
    path = os.path.join(os.path.dirname(__file__), "results",
                        "multichip_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
