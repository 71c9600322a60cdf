"""ann-benchmarks-style recall/QPS sweep (reference counterpart: the
benchmark/ directory's committed JSONs — recall@{1,10,100} vs q/s, n_probe
swept in powers of two; protocol in benchmark/turing/sift1m/README.md).

Usage:
  python benchmark/sweep.py                      # synthetic SIFT1M-class
  python benchmark/sweep.py --base sift_base.fvecs --query sift_query.fvecs \
      --learn sift_learn.fvecs                   # real texmex datasets

Writes benchmark/results/<name>.json with one entry per n_probe.
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

# persistent XLA compile cache (compiles here take 15-60s per program; the
# cache makes repeat runs' train/add compile cost ~nothing). NOTE: must go
# through jax.config — this environment's sitecustomize imports jax at
# interpreter startup, so env vars are already frozen.
_cache_dir = os.path.expanduser("~/.cache/torchpq_tpu_jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base")
    ap.add_argument("--query")
    ap.add_argument("--learn")
    ap.add_argument("--name", default=None)
    ap.add_argument("--n-base", type=int, default=1_000_000)
    ap.add_argument("--n-query", type=int, default=10_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--n-cells", type=int, default=4096)
    ap.add_argument("--n-subvectors", type=int, default=64)
    ap.add_argument("--distance", default="euclidean")
    ap.add_argument("--residual", action="store_true")
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 10, 100])
    ap.add_argument("--n-probes", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16, 32, 64, 128])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--initial-mult", type=int, default=3)
    ap.add_argument("--spectrum", default="manifold-12",
                    choices=("flat", "decay", "manifold-12", "manifold-16",
                             "manifold-24"),
                    help="decay: GIST-like per-dim variance decay (see "
                         "bench.make_data)")
    ap.add_argument("--cache", default=None,
                    help="scan cache dtype: bfloat16|int8|float32")
    ap.add_argument("--index", default="ivfpq", choices=("ivfpq", "ivfpqr"),
                    help="ivfpqr: two-stage rerank index (extra "
                         "--rerank-subvectors bytes/code)")
    ap.add_argument("--rerank-subvectors", type=int, default=32)
    ap.add_argument("--rerank-multiplier", type=int, default=4)
    ap.add_argument("--n-bits", type=int, default=8, choices=(4, 8),
                    help="4: packed-nibble PQ (16-cluster codebooks, "
                         "n_subvectors/2 B per code)")
    ap.add_argument("--skip-flat", action="store_true",
                    help="omit the exhaustive-sweep entry (e.g. when only "
                         "the probed entries are under test; the --cache "
                         "none flat entry rides the decode-on-the-fly "
                         "sweep, so it is no longer prohibitive)")
    ap.add_argument("--scan-group", type=int, default=4,
                    help="supercells: adjacent cells scanned per block "
                         "(fewer, larger window DMAs; see ops/adc.py)")
    ap.add_argument("--probe-cap", default=None,
                    help="static probe-axis cap under grouping: 'auto', "
                         "an int, or unset (see IVFPQIndex.scan_probe_cap)")
    ap.add_argument("--merge-taper", type=int, nargs=2, default=None,
                    metavar=("P0", "KP_TAIL"),
                    help="rank-tapered deep-k merge: first P0 pairs keep "
                         "k_pair columns, the rest KP_TAIL "
                         "(IVFPQIndex.scan_merge_taper)")
    ap.add_argument("--k-pair", type=int, default=None,
                    help="explicit per-pair partial width "
                         "(IVFPQIndex.scan_k_pair; None = auto)")
    ap.add_argument("--no-spill", action="store_true",
                    help="reference add semantics: every item in its argmax "
                         "cell (the A/B against the default bounded-cell "
                         "spill routing)")
    args = ap.parse_args()

    from bench import make_data, brute_force_topk, recall_at_k
    from torchpq_tpu.index import IVFPQIndex, IVFPQRIndex
    from torchpq_tpu import native
    from torchpq_tpu.ops import adc

    if args.base:
        base = native.read_fvecs(args.base, n_max=args.n_base)
        query = native.read_fvecs(args.query, n_max=args.n_query)
        learn = (native.read_fvecs(args.learn) if args.learn
                 else base[:max(len(base) // 10, 10_000)])
        name = args.name or os.path.basename(args.base).split(".")[0]
    else:
        base, query = make_data(args.n_base, args.n_query, args.d,
                                spectrum=args.spectrum)
        learn = base[:100_000]
        name = args.name or f"synthetic{len(base)}"
    d = base.shape[1]

    kwargs = dict(
        d_vector=d, n_subvectors=args.n_subvectors, n_cells=args.n_cells,
        distance=args.distance, pq_use_residual=args.residual,
        initial_size=max(16, (len(base) // args.n_cells) * args.initial_mult),
        scan_cache_dtype=args.cache, n_bits=args.n_bits)
    if args.index == "ivfpqr":
        index = IVFPQRIndex(n_subvectors_rerank=args.rerank_subvectors,
                            rerank_multiplier=args.rerank_multiplier,
                            **kwargs)
    else:
        index = IVFPQIndex(**kwargs)
    index.use_approx_topk = True
    if not args.no_spill:
        index.spill_cells = 8
        index.spill_capacity = index.max_cell_capacity
    index.scan_group = args.scan_group  # supercell grouping (ops/adc.py)
    if args.probe_cap is not None:
        index.scan_probe_cap = (args.probe_cap if args.probe_cap == "auto"
                                else int(args.probe_cap))
    index.scan_k_pair = args.k_pair
    if args.merge_taper is not None:
        index.scan_merge_taper = tuple(args.merge_taper)

    def _mem(tag):
        ms = jax.local_devices()[0].memory_stats() or {}
        print(f"[mem] {tag}: in_use="
              f"{ms.get('bytes_in_use', 0) / 1e9:.2f}GB peak="
              f"{ms.get('peak_bytes_in_use', 0) / 1e9:.2f}GB limit="
              f"{ms.get('bytes_limit', 0) / 1e9:.2f}GB", file=sys.stderr)

    t0 = time.perf_counter()
    index.train(jnp.asarray(learn).T)
    jax.effects_barrier()
    train_s = time.perf_counter() - t0
    _mem("post-train")
    # scale the ingest chunk with d: transients are O(chunk * d)
    chunk_n = max(62_500, 250_000 * 128 // d)
    t0 = time.perf_counter()
    for i in range(0, len(base), chunk_n):
        index.add(jnp.asarray(base[i:i + chunk_n]).T)
        jax.effects_barrier()
        _mem(f"add[{i + chunk_n}]")
    add_s = time.perf_counter() - t0
    print(f"train {train_s:.1f}s add {add_s:.1f}s", file=sys.stderr)

    k_max = max(args.ks)
    # GT depends only on the dataset (+ metric/sizes/k, appended by
    # brute_force_topk) — NOT on the run name or index config. Keying by
    # dataset identity lets e.g. the int8-cache and IVFPQR sweeps reuse the
    # class sweep's GT automatically, and fixes the latent collision where
    # two synthetic runs with different --d but the same default name
    # ("synthetic<n>") would silently share a stale GT file.
    if args.base:
        # base AND query identity: same base scanned with two different
        # query files of equal length must not share a GT entry
        gt_key = ("sweep_" + os.path.basename(args.base).split(".")[0]
                  + "_" + (os.path.basename(args.query).split(".")[0]
                           if args.query else "headq"))
    else:
        gt_key = f"sweep_synth_d{d}" + (
            "" if args.spectrum == "flat" else f"_{args.spectrum}")
    gt = brute_force_topk(base, query, k_max, cache_key=gt_key,
                          metric=args.distance)
    ids_map = np.arange(len(base))
    qj = jnp.asarray(query.T)

    entries = []
    # partial-row flush target (full artifact written at the end): a
    # wall-clock-killed sweep keeps its completed rows on record
    rr0 = (f"r{args.rerank_subvectors}" if args.index == "ivfpqr" else "")
    _partial = os.path.join(
        os.path.dirname(__file__), "results",
        f"ivf{args.n_cells}_pq{args.n_subvectors}{rr0}"
        f"{'_residual' if args.residual else ''}_{name}.partial.json")
    os.makedirs(os.path.dirname(_partial), exist_ok=True)
    for n_probe in args.n_probes + ([] if args.skip_flat else ["flat"]):
        if n_probe == "flat":
            # exhaustive MXU sweep (ops/flat_adc.py): max-recall point
            index.scan_mode = "flat"
        elif n_probe > args.n_cells:
            continue
        else:
            # pin the IVF scan so the curve shows probing behavior — auto
            # mode would plan the flat sweep past the crossover and every
            # high-n_probe row would just repeat the "flat" entry
            index.scan_mode = "cell_major"
            index.n_probe = n_probe
        # each k is timed at ITS OWN search (a k=100 search is slower than
        # k=10 — one shared k_max timing would overstate small-k cost)
        for k in args.ks:
            vals, pred = index.search(qj, k=k)
            jax.block_until_ready(vals)
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                vals, pred = index.search(qj, k=k)
            jax.block_until_ready(vals)
            dt = (time.perf_counter() - t0) / args.repeats
            pred_np = np.asarray(pred)
            entry = {"n_probe": n_probe, "k": k,
                     "qps": round(len(query) / dt, 1),
                     f"recall@{k}": round(
                         recall_at_k(pred_np, gt[:, :k], ids_map, k), 4)}
            if n_probe != "flat" and adc.LAST_GATE:
                # resolved impl of the scan that actually served this row
                # (recorded at trace time — see ops/adc.LAST_GATE)
                entry["scan_gate"] = dict(adc.LAST_GATE)
            entries.append(entry)
            print(entry, file=sys.stderr)
            with open(_partial, "w") as f:
                json.dump({"dataset": name, "partial": True,
                           "entries": entries}, f, indent=1)

    out = {
        "dataset": name, "n_base": len(base), "d": d,
        "n_cells": args.n_cells, "n_subvectors": args.n_subvectors,
        "distance": args.distance, "residual": args.residual,
        "index": args.index, "n_bits": args.n_bits,
        "cache": args.cache, "spill": not args.no_spill,
        "scan_group": args.scan_group, "probe_cap": args.probe_cap,
        "k_pair": args.k_pair, "merge_taper": args.merge_taper,
        "super_probe": bool(getattr(index, "scan_super_probe", False)),
        "initial_mult": args.initial_mult,
        "scan_impl": index.scan_impl, "s_max": int(index.max_cell_capacity),
        "train_s": round(train_s, 2), "add_s": round(add_s, 2),
        "device": str(jax.devices()[0]), "entries": entries,
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "results"),
                exist_ok=True)
    # warm re-train on a fresh identically-configured index: every program
    # is now compiled, so this isolates COMPUTE from the cold train_s above
    # (which includes first-process compiles — the r3 codes_flat artifact
    # recorded a 1565.9 s "train" that was a compile storm). Entries above
    # are untouched; this runs after all timing rows.
    try:
        kwargs2 = dict(kwargs)
        if args.index == "ivfpqr":
            warm = IVFPQRIndex(n_subvectors_rerank=args.rerank_subvectors,
                               rerank_multiplier=args.rerank_multiplier,
                               **kwargs2)
        else:
            warm = IVFPQIndex(**kwargs2)
        t0 = time.perf_counter()
        warm.train(jnp.asarray(learn).T)
        jax.effects_barrier()
        out["train_warm_s"] = round(time.perf_counter() - t0, 2)
        del warm
    except Exception as e:  # never lose the sweep over the warm probe
        out["train_warm_s"] = f"failed: {str(e)[:80]}"

    rr = (f"r{args.rerank_subvectors}" if args.index == "ivfpqr" else "")
    path = os.path.join(os.path.dirname(__file__), "results",
                        f"ivf{args.n_cells}_pq{args.n_subvectors}{rr}"
                        f"{'_residual' if args.residual else ''}_{name}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    try:
        os.remove(_partial)
    except OSError:
        pass


if __name__ == "__main__":
    main()
