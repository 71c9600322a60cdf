"""K-means throughput benchmark, mirroring the reference's protocol.

Reference: /root/reference/benchmark/turing/kmeans/README.md — 15 iterations,
tol=0, random init, synthetic normal data, fp32; contestants torchpq.clustering
.KMeans / faiss.Clustering / KeOps on a Tesla T4 (plots only, no JSONs). Its
sweeps:
  * n_data     at (k=256, d=256) and (k=16384, d=256)
  * n_clusters at (n=1M, d=128)
  * n_features at (k=1024, n=1M)   [faiss/KeOps OOM at d>512; torchpq finishes]

This runs the same sweeps on torchpq_tpu.clustering.KMeans and records
seconds per fit (and per-iteration) as JSON in benchmark/results/kmeans.json.
No absolute baseline numbers exist upstream (plots only), so the JSON is the
record; eyeballed from the reference plots, torchpq-T4 fits (n=1M, k=256,
d=256) in roughly 2-4 s — printed alongside for context.

Usage: python benchmark/kmeans_bench.py [--quick]
"""

import argparse
import json
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

from torchpq_tpu.clustering import KMeans  # noqa: E402

N_ITER = 15


def run_one(n, d, k, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    xj = jnp.asarray(x.T)  # reference layout [d, n]
    km = KMeans(n_clusters=k, distance="euclidean", init_mode="random",
                max_iter=N_ITER, tol=0.0, n_redo=1)
    # warm-up fit on a slice compiles every program in the loop
    km_warm = KMeans(n_clusters=k, distance="euclidean", init_mode="random",
                     max_iter=2, tol=0.0, n_redo=1)
    km_warm.fit(xj[:, : max(4 * k, 4096)])
    jax.effects_barrier()

    t0 = time.perf_counter()
    km.fit(xj)
    jax.effects_barrier()
    fit_s = time.perf_counter() - t0
    # steady-state: everything compiled; a second fit measures pure execution
    km2 = KMeans(n_clusters=k, distance="euclidean", init_mode="random",
                 max_iter=N_ITER, tol=0.0, n_redo=1)
    t0 = time.perf_counter()
    km2.fit(xj)
    jax.effects_barrier()
    warm_s = time.perf_counter() - t0
    return fit_s, warm_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="halve the largest points (smoke test)")
    args = ap.parse_args()

    sweeps = {
        # (name, [(n, d, k), ...])
        "n_data_k256_d256": [(n, 256, 256) for n in
                             (100_000, 250_000, 500_000, 1_000_000)],
        "n_data_k16384_d256": [(n, 256, 16384) for n in
                               (250_000, 1_000_000)],
        "n_clusters_n1m_d128": [(1_000_000, 128, k) for k in
                                (256, 1024, 4096, 16384)],
        "n_features_k1024_n1m": [(1_000_000, d, 1024) for d in
                                 (64, 256, 1024)],
    }
    if args.quick:
        sweeps = {"n_data_k256_d256": [(100_000, 256, 256)]}

    out = {"protocol": "15 iters, tol=0, random init, fp32, normal data",
           "device": jax.devices()[0].device_kind, "entries": []}
    for name, points in sweeps.items():
        for (n, d, k) in points:
            try:
                fit_s, warm_s = run_one(n, d, k)
            except Exception as e:  # OOM etc. — record like the ref plots do
                out["entries"].append({"sweep": name, "n": n, "d": d, "k": k,
                                       "error": str(e)[:200]})
                print(f"[kmeans] {name} n={n} d={d} k={k}: FAILED {e}",
                      file=sys.stderr)
                continue
            out["entries"].append({
                "sweep": name, "n": n, "d": d, "k": k,
                "fit_s": round(fit_s, 3), "warm_fit_s": round(warm_s, 3),
                "warm_s_per_iter": round(warm_s / N_ITER, 4)})
            print(f"[kmeans] {name} n={n} d={d} k={k}: fit {fit_s:.2f}s "
                  f"warm {warm_s:.2f}s ({warm_s / N_ITER * 1e3:.0f} ms/iter)",
                  file=sys.stderr)

    # device-suffixed filename off-TPU so a CPU smoke run can never clobber
    # the recorded TPU results
    platform = jax.devices()[0].platform.lower()
    fname = ("kmeans.json" if platform not in ("cpu", "gpu")
             else f"kmeans_{platform}.json")
    path = os.path.join(os.path.dirname(__file__), "results", fname)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "kmeans-warm-fit-n1m-k256-d256",
                      "entries": len(out["entries"]), "results": path}))


if __name__ == "__main__":
    main()
