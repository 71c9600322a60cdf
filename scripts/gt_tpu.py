"""Exact ground-truth top-k computed on the TPU.

This host's numpy BLAS runs single-threaded at ~1-3 GFLOP/s, which makes
exact 10M-scale ground truth a multi-hour job; the MXU does the same
25 TFLOP in seconds. Exactness is preserved by scoring in f32 with
precision=HIGHEST and taking top-k with a segment-wise exact merge:
lax.top_k inside 4096-wide segments (a true sort, vectorized and cheap at
that width), then an exact second-level top-k over the segment winners.
This sidesteps the "lax.top_k over a 10M-wide row is a full sort" trap.

Writes the same /tmp/gt_<key>_<metric>_<nb>_<nq>_<k>.npy cache file that
bench.brute_force_topk reads, so the bench picks it up and skips its host
fallback.

Usage:
  python scripts/gt_tpu.py --xl          # 10M dataset -> gt_xl_... cache
  python scripts/gt_tpu.py --check-1m    # recompute 1M GT, compare to the
                                         # host-BLAS cached file, don't write
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_cache_dir = os.path.expanduser("~/.cache/torchpq_tpu_jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@functools.partial(jax.jit, static_argnames=("k", "seg", "metric"))
def _chunk_topk(q, base_t, b_sq, *, k, seg, metric="euclidean"):
    """Exact top-k of q [c, d] against base_t [d, n_pad].

    euclidean: score = 2<q,y> - |y|^2 (b_sq = |y|^2, +inf on padding).
    inner/cosine: score = <q,y> - b_sq with b_sq 0 on live columns and
    +inf on padding (cosine callers pre-normalize q and base).
    Returns (vals [c, k], addr [c, k]) with addr in base row indices.
    """
    s = jnp.matmul(q, base_t, precision=jax.lax.Precision.HIGHEST)
    if metric == "euclidean":
        s = 2.0 * s
    s = s - b_sq
    c, n_pad = s.shape
    n_seg = n_pad // seg
    v, i = jax.lax.top_k(s.reshape(c, n_seg, seg), k)    # exact within seg
    v2, flat = jax.lax.top_k(v.reshape(c, n_seg * k), k)  # exact merge
    within = jnp.take_along_axis(i.reshape(c, n_seg * k), flat, axis=1)
    addr = (flat // k) * seg + within
    return v2, addr


def gt_on_tpu(base, query, k, chunk=64, seg=4096, metric="euclidean"):
    if metric == "cosine":
        base = base / np.maximum(
            np.linalg.norm(base, axis=1, keepdims=True), 1e-12)
        query = query / np.maximum(
            np.linalg.norm(query, axis=1, keepdims=True), 1e-12)
    n, d = base.shape
    n_pad = ((n + seg - 1) // seg) * seg
    b_sq = np.full((n_pad,), np.inf, np.float32)
    b_sq[:n] = ((base.astype(np.float32) ** 2).sum(1)
                if metric == "euclidean" else 0.0)
    print(f"[gt_tpu] uploading base {n}x{d} (+pad {n_pad - n})",
          file=sys.stderr)
    base_t = np.zeros((d, n_pad), np.float32)
    base_t[:, :n] = base.T
    t0 = time.perf_counter()
    base_t = jnp.asarray(base_t)
    b_sq = jnp.asarray(b_sq)
    jax.block_until_ready(base_t)
    print(f"[gt_tpu] upload {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    out = np.empty((len(query), k), np.int64)
    t0 = time.perf_counter()
    for i in range(0, len(query), chunk):
        q = query[i:i + chunk].astype(np.float32)
        m = len(q)
        if m < chunk:  # keep one jit specialization
            q = np.pad(q, ((0, chunk - m), (0, 0)))
        _, addr = _chunk_topk(jnp.asarray(q), base_t, b_sq, k=k, seg=seg,
                              metric=metric)
        out[i:i + m] = np.asarray(addr[:m], np.int64)
        if i == 0:
            print(f"[gt_tpu] first chunk (incl. compile) "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    print(f"[gt_tpu] total {time.perf_counter() - t0:.1f}s for "
          f"{len(query)} queries", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xl", action="store_true")
    ap.add_argument("--check-1m", action="store_true")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--n-base", type=int, default=1_000_000)
    ap.add_argument("--n-query", type=int, default=10_000)
    ap.add_argument("--spectrum", default="flat")
    ap.add_argument("--metric", default="euclidean",
                    choices=("euclidean", "inner", "cosine"))
    ap.add_argument("--key", default=None,
                    help="cache-key override, e.g. sweep_synth_d128 with "
                         "--metric cosine "
                         "(writes the file benchmark/sweep.py reads; sweep "
                         "looks the cache up at k = max(--ks), so pass the "
                         "matching --k, e.g. --k 100)")
    args = ap.parse_args()

    from bench import make_data

    if args.check_1m:
        base, query = make_data(1_000_000, 10_000, 128)
        got = gt_on_tpu(base, query, args.k, metric=args.metric)
        ref = np.load(
            f"/tmp/gt_full_{args.metric}_1000000_10000_{args.k}.npy")
        match = (got == ref).mean()
        print(f"[gt_tpu] element match vs host-BLAS GT: {match:.6f}")
        # mismatches must be score ties / epsilon reorderings, not errors:
        # compare as sets per row
        row_set = np.mean([len(np.intersect1d(g, r)) == args.k
                           for g, r in zip(got, ref)])
        print(f"[gt_tpu] rows identical as sets: {row_set:.6f}")
        return

    if args.xl:
        n_base, n_query, key = 10_000_000, 10_000, "xl"
    else:
        n_base, n_query, key = args.n_base, args.n_query, "full"
    base, query = make_data(n_base, n_query, args.d,
                            spectrum=args.spectrum)
    got = gt_on_tpu(base, query, args.k, metric=args.metric)
    key = args.key or key
    path = f"/tmp/gt_{key}_{args.metric}_{n_base}_{n_query}_{args.k}.npy"
    np.save(path, got)
    print(f"[gt_tpu] wrote {path}")


if __name__ == "__main__":
    main()
