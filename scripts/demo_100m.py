"""100M x 128d single-chip capacity demo (scan_cache_dtype='none').

The memory story VERDICT asked for: PQ64 codes are 64 B/slot, so 100M
vectors cost 8.6 GB of HBM at capacity 134M (pow2 cells) — impossible for
any decoded cache (bf16 34 GB, int8 17 GB at this capacity) on a 16 GB
chip, easy for the code-domain index. Everything stays on device:

  * base vectors are GENERATED on device chunk by chunk (manifold model,
    seed-replayed — the dev tunnel at 79 MB/s would take 2.7 h to ship
    51 GB of f32);
  * exact GT is computed by replaying the same chunks against the queries
    with a running top-k (one [nq, 1M] matmul per chunk);
  * search runs the one-hot code-domain scan (ops/onehot_adc.py).

Prints one JSON line per search point.
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

from torchpq_tpu.index import IVFPQIndex

D_INT = 12


def chunk_data(key, n, d):
    kz, ke = jax.random.split(key)
    z = jax.random.normal(kz, (n, D_INT), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(7), (D_INT, d), jnp.float32)
    x = z @ (w / np.sqrt(D_INT))
    return x + 0.02 * jax.random.normal(ke, (n, d), jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--n-cells", type=int, default=32768)
    ap.add_argument("--nq", type=int, default=256)
    ap.add_argument("--nq-list", type=int, nargs="*", default=None,
                    help="extra batch sizes for the serving curve "
                         "(probed rows re-timed at each)")
    ap.add_argument("--train-n", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cache", default="none", choices=["none", "int8"],
                    help="scan tier: 'none' = code-domain (m B/slot, the "
                         "100M config), 'int8' = int8 decoded cache "
                         "(+1 B/dim; at 50M it fits one chip and serves "
                         "10-20x faster than the decode-bound codes scan)")
    ap.add_argument("--spill-cap", type=int, default=8192,
                    help="per-cell capacity bound (spill routes overflow); "
                         "smaller caps shrink every probed window")
    ap.add_argument("--out", type=str, default="demo_100m.json")
    args = ap.parse_args()
    d, m = 128, 64

    # Tiny initial store + exact pre-sizing: at 100M x 64 B a relayout
    # (old + new storage live simultaneously) cannot fit HBM — the first
    # attempt died at 61M when ONE cell overflowed and the doubling gather
    # asked for 2 x 8.6 GB. So cells are presized from a counting pre-pass
    # that REPLAYS the exact spill routing of the ingest pass (both are
    # deterministic functions of the chunk stream + occupancy history),
    # and expand() runs ONCE while the store is 33 MB (exact=True: 16-
    # multiple capacities, not pow2 — the pow2 1.3-1.5x slack is what kept
    # the int8 tier from fitting 50M).
    spill_cap = args.spill_cap
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=args.n_cells,
                       initial_size=16, scan_cache_dtype=args.cache)
    index.use_approx_topk = True
    index.vq_codec.kmeans.max_iter = 10
    index.pq_codec.kmeans.max_iter = 15

    t0 = time.perf_counter()
    train = chunk_data(jax.random.PRNGKey(10_000), args.train_n, d)
    index.train(train.T)
    del train
    train_s = time.perf_counter() - t0
    print(f"[100m] train {train_s:.0f}s (n={args.train_n}, "
          f"cells={args.n_cells})", flush=True)

    # ---- counting pre-pass: replay the ingest routing ----
    # MUST produce the exact per-cell counts the ingest pass will: a single
    # boundary item flipping cells between passes would overflow a full
    # cell and trigger the un-fittable relayout this exists to avoid. Both
    # passes call the same jitted topk_sim + spill_assign_device on the
    # same chunks with the same occupancy history, so the routing replays
    # bit-for-bit; spill bounds every cell at spill_cap, which also bounds
    # the search windows (s_max == max cell capacity).
    from torchpq_tpu.ops.max_sim import topk_sim
    from torchpq_tpu.ops.spill import spill_assign_device
    gen = jax.jit(lambda kid: chunk_data(jax.random.PRNGKey(kid), args.chunk, d))
    cents = index.vq_codec.kmeans._centroids[0]

    t0 = time.perf_counter()
    sizes = jnp.zeros((args.n_cells,), jnp.int32)
    assert args.n % args.chunk == 0
    for c0 in range(0, args.n, args.chunk):
        x = gen(c0 // args.chunk)
        _, top = topk_sim(x, cents, 8, "euclidean", approx=True)
        _, cnts = spill_assign_device(top.astype(jnp.int32), sizes,
                                      cap=spill_cap, n_cells=args.n_cells)
        sizes = sizes + cnts
    counts_np = np.asarray(sizes).astype(np.int64)
    # free the count pass's device leftovers before the big allocation
    del x, top, cnts, sizes
    count_s = time.perf_counter() - t0
    g16 = np.where(np.maximum(counts_np, 16) < 128, 16, 128)
    cap_np = (np.maximum(counts_np, 16) + g16 - 1) // g16 * g16
    print(f"[100m] count pass {count_s:.0f}s: max cell {counts_np.max():,}, "
          f"presized capacity {cap_np.sum():,} slots "
          f"({cap_np.sum() * m / 1e9:.2f} GB codes)", flush=True)
    index.expand(required={int(c): int(counts_np[c])
                           for c in np.nonzero(counts_np > 16)[0]},
                 exact=True)
    index.spill_cells = 8
    index.spill_capacity = spill_cap
    train_s += count_s

    queries = chunk_data(jax.random.PRNGKey(99_999), args.nq, d)
    jax.block_until_ready(queries)

    # exact GT by seed replay, fused with ingestion: generate chunk ->
    # update running exact top-k for the queries -> add to the index
    @jax.jit
    def gt_step(q, x, base0, best_v, best_i):
        s = (2.0 * q @ x.T - jnp.sum(jnp.square(x), axis=1)[None, :])
        v = jnp.concatenate([best_v, s], axis=1)
        i = jnp.concatenate(
            [best_i, jnp.broadcast_to(
                base0 + jnp.arange(x.shape[0], dtype=jnp.int32)[None, :],
                s.shape)], axis=1)
        vv, ii = jax.lax.top_k(v, best_v.shape[1])
        return vv, jnp.take_along_axis(i, ii, axis=1)

    best_v = jnp.full((args.nq, args.k), -jnp.inf, jnp.float32)
    best_i = jnp.full((args.nq, args.k), -1, jnp.int32)
    # GT sub-chunking: one [nq, chunk] similarity matrix + its concat
    # transients peak ~3 GB at chunk=1M — on the int8 tier's ~10.7 GB
    # state that was the r5 50M OOM. 125k sub-slices cap the GT transient
    # at ~0.4 GB; the running top-k absorbs them identically.
    gt_sub = 125_000
    while args.chunk % gt_sub:
        gt_sub //= 2
    t0 = time.perf_counter()
    added = 0
    for c0 in range(0, args.n, args.chunk):
        nchunk = min(args.chunk, args.n - c0)
        x = chunk_data(jax.random.PRNGKey(c0 // args.chunk), nchunk, d)
        for s0 in range(0, nchunk, gt_sub):
            best_v, best_i = gt_step(
                queries, jax.lax.dynamic_slice_in_dim(x, s0, gt_sub),
                jnp.int32(c0 + s0), best_v, best_i)
        index.add(x.T)
        added += nchunk
        if (c0 // args.chunk) % 10 == 0:
            el = time.perf_counter() - t0
            print(f"[100m] added {added:,} in {el:.0f}s "
                  f"({added / max(el, 1e-9):,.0f} vec/s)", flush=True)
    jax.block_until_ready(best_v)
    add_s = time.perf_counter() - t0
    gt = np.asarray(best_i)
    print(f"[100m] ingest+GT {add_s:.0f}s -> "
          f"{args.n / add_s:,.0f} vec/s; n_items={index.n_items:,} "
          f"capacity={index.capacity:,}", flush=True)
    ms = jax.local_devices()[0].memory_stats() or {}
    # the axon tunnel exposes no memory_stats; fall back to summing the
    # index's live device state (storage + aux + maps) — the resident set
    # the capacity claim is about
    # state_nbytes sums device-array metadata — state_dict() would pull
    # the whole multi-GB index to the host and drop the TPU tunnel
    state_gb = index.state_nbytes() / 1e9
    hbm_gb = ms.get("bytes_in_use", 0) / 1e9 or round(state_gb, 2)
    print(f"[100m] HBM in use: {hbm_gb:.2f} GB "
          f"(index state {state_gb:.2f} GB, "
          f"peak {ms.get('peak_bytes_in_use', 0) / 1e9:.2f} GB)",
          flush=True)

    # pack codes rows into full 128-lane tiles (donated reshape, zero copy):
    # without this, the first search re-lays the 9.2 GB u8[*, 64] codes into
    # an 18.4 GB lane-padded tile and the compile itself OOMs the chip.
    # int8-cache tier: searches never read the codes, no freeze needed.
    if args.cache == "none":
        try:
            index.freeze_codes()
            print(f"[100m] codes frozen for serving: "
                  f"storage {tuple(index._storage.shape)}", flush=True)
        except Exception as e:  # the pack is a copy until storage is written
            # packed at ingest (XLA offers no zero-copy re-view of a live
            # buffer); past ~half-HBM codes the demo serves via the gather
            print(f"[100m] freeze_codes unavailable at this scale: "
                  f"{str(e)[:120]}", flush=True)

    mode = "code_domain" if args.cache == "none" else f"{args.cache}_cache"
    results = {"n": args.n, "d": d, "m": m, "n_cells": args.n_cells,
               "mode": mode, "spill_cap": spill_cap, "nq": args.nq,
               "k": args.k,
               "device": jax.local_devices()[0].device_kind,
               "hbm_gb": hbm_gb, "index_state_gb": round(state_gb, 2),
               "train_s": round(train_s, 1), "ingest_s": round(add_s, 1),
               "entries": []}
    qj = queries.T
    path = os.path.join(os.path.dirname(__file__), "..", "benchmark",
                        "results", args.out)

    def _flush():
        # write after every row: a wall-clock-killed run still leaves the
        # build stats + whatever search points completed on the record
        with open(path, "w") as f:
            json.dump(results, f, indent=1)

    _flush()
    # pin the scan per row (sweep.py-style honesty): probed points run the
    # probed cell-major codes scan (Pallas kernel when the gate passes —
    # recorded per row), the flat decode-on-the-fly sweep is its own row.
    # The VERDICT deliverable rows (np=1/8/32) run FIRST; the flat sweep
    # goes last and is exception-guarded — at 100M it is the riskiest
    # program and must not erase the probed results if it OOMs.
    from torchpq_tpu.ops import adc

    def one_row(n_probe, q_batch, nq_row):
        try:
            if n_probe == "flat":
                index.scan_mode = "flat"
                reps = 1  # whole-storage sweep; one rep is plenty at 100M
            else:
                index.scan_mode = "cell_major"
                index.n_probe = n_probe
                reps = 3 if n_probe == 1 else 1
            vals, pred = index.search(q_batch, k=args.k)
            jax.block_until_ready(vals)
            t0 = time.perf_counter()
            for _ in range(reps):
                vals, pred = index.search(q_batch, k=args.k)
            jax.block_until_ready(vals)
        except Exception as e:
            out = {"n": args.n, "n_probe": n_probe, "nq": nq_row,
                   "status": f"failed: {str(e)[:200]}"}
            print(json.dumps(out), flush=True)
            results["entries"].append(out)
            _flush()
            return
        dt = (time.perf_counter() - t0) / reps
        pred = np.asarray(pred)
        nr = min(nq_row, args.nq)  # GT exists for the first args.nq queries
        rec = float(np.mean([len(set(pred[i]) & set(gt[i])) / args.k
                             for i in range(nr)]))
        out = {"n": args.n, "n_probe": n_probe, "qps": round(nq_row / dt),
               "recall@10": round(rec, 4), "ms_per_batch": round(dt * 1e3, 1),
               "nq": nq_row, "mode": mode, "hbm_gb": hbm_gb,
               "scan_gate": dict(adc.LAST_GATE),
               "train_s": round(train_s, 1), "ingest_s": round(add_s, 1)}
        print(json.dumps(out), flush=True)
        results["entries"].append(out)
        _flush()

    for n_probe in (1, 8, 32, "flat"):
        one_row(n_probe, qj, args.nq)
    # serving batch-size curve: duplicate/slice the GT'd queries to the
    # requested sizes (recall scored on the first args.nq of each batch)
    for nq2 in (args.nq_list or ()):
        if nq2 == args.nq:
            continue
        try:
            if nq2 <= args.nq:
                q2 = qj[:, :nq2]
            else:
                reps_n = -(-nq2 // args.nq)
                q2 = jnp.tile(qj, (1, reps_n))[:, :nq2]
            jax.block_until_ready(q2)
        except Exception as e:  # device pressure must not kill later rows
            print(f"[100m] nq={nq2} staging failed: {str(e)[:120]}",
                  flush=True)
            continue
        for n_probe in (1, 8, 32):
            one_row(n_probe, q2, nq2)

    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
