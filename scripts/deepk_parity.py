"""Deep-k (k=100) recall-parity tuning grid at the 1M class-sweep shape.

VERDICT r3 #2/#3: the recall-parity g4 curve loses q/s@100 to the T4 at
every n_probe, while g4+cap16 measured 149k q/s end-to-end at np=32 —
faster than the T4's 120.3k — at an UNMEASURED recall. This grid measures
exactly that trade: for each n_probe, (scan_group, probe_cap, k_pair)
combos with end-to-end QPS AND recall@100 on the class sweep's dataset +
GT, so the planner's auto settings can be pinned to the fastest
recall-neutral point (recall within ~0.005 of the uncapped g4 row).

Reference counterpart: the T4 deep-k columns in BASELINE.md (its streaming
in-register merge makes k=100 nearly free per candidate —
torchpq/kernels/cuda/ivfpq_topk.cu:763-931; here deep k pays per-pair
bookkeeping ~ n_pairs * k_pair, which cap and k_pair shrink directly).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_data, brute_force_topk, recall_at_k
from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu import util
from torchpq_tpu.ops import adc


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--initial-mult", type=int, default=3)
    ap.add_argument("--tag", default="r4")
    args = ap.parse_args()
    n_base, d, n_cells, m, nq, k = 1_000_000, 128, 4096, 64, 10_000, 100
    base, query = make_data(n_base, nq, d, spectrum="manifold-12")
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=max(16, (n_base // n_cells)
                                        * args.initial_mult))
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity

    t0 = time.perf_counter()
    state = f"/tmp/deepk_1m_state_m{args.initial_mult}.npz"
    if os.path.exists(state):
        index.load(state)
        print(f"loaded {state} in {time.perf_counter() - t0:.0f}s",
              flush=True)
    else:
        index.train(jnp.asarray(base[:100_000]).T)
        for i in range(0, n_base, 250_000):
            index.add(jnp.asarray(base[i:i + 250_000]).T)
        index.save(state)
        print(f"build {time.perf_counter() - t0:.0f}s "
              f"s_max={index.max_cell_capacity}", flush=True)

    gt = brute_force_topk(base, query, k, cache_key="sweep_synth_d128_manifold-12",
                          metric="euclidean")
    ids_map = np.arange(n_base)
    qj = jnp.asarray(query.T)
    index.scan_mode = "cell_major"

    rows = []
    path = os.path.join(os.path.dirname(__file__), "..", "benchmark",
                        "results", f"deepk_parity_{args.tag}.json")

    def run(n_probe, group, cap, k_pair, reps=3):
        index.n_probe = n_probe
        index.scan_group = group
        index.scan_probe_cap = cap
        index.scan_k_pair = k_pair
        vals, pred = index.search(qj, k=k)
        jax.block_until_ready(vals)
        t0 = time.perf_counter()
        for _ in range(reps):
            vals, pred = index.search(qj, k=k)
        jax.block_until_ready(vals)
        dt = (time.perf_counter() - t0) / reps
        rec = recall_at_k(np.asarray(pred), gt[:, :k], ids_map, k)
        row = {"n_probe": n_probe, "group": group, "cap": cap,
               "k_pair": k_pair, "qps": round(nq / dt, 1),
               "recall@100": round(rec, 4),
               "scan_gate": dict(adc.LAST_GATE)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(path, "w") as f:
            json.dump({"n_base": n_base, "d": d, "n_cells": n_cells,
                       "k": k, "nq": nq, "spill": True,
                       "device": str(jax.devices()[0]), "entries": rows}, f,
                      indent=1)

    for n_probe in (8, 32, 64, 128):
        # baseline: the recall-parity curve point (g4, no cap)
        run(n_probe, 4, None, None)
        # k_pair ladder UNCAPPED: same probed set (recall cost only from
        # per-cell partial truncation), linear bookkeeping shrink
        for kp in (32, 48):
            run(n_probe, 4, None, kp)
        # cap ladder (r4a grid showed 2x slack is NOT recall-neutral at
        # k=100 for np<=32; keep the 3x/4x points and the np=128 2x point
        # that measured near-neutral)
        for s in (2, 3):
            cap = s * util.cdiv(n_probe, 4)
            if cap < n_probe:
                run(n_probe, 4, cap, None)
                run(n_probe, 4, cap, 32)

    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
