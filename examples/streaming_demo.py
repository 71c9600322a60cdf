"""Streaming ingestion demo: online clustering + a live IVFPQ index.

Reference counterpart: the MinibatchKMeans capability (torchpq/clustering/
MinibatchKMeans.py — per-batch EMA centroid updates for data that arrives
as a stream) which the reference ships without a usage example. This demo
shows the intended composition end to end:

  1. warm up MinibatchKMeans on the first batches (coarse structure),
  2. train an IVFPQIndex once enough data has arrived,
  3. keep ingesting: add each new batch, evict the oldest (sliding
     window), and serve queries continuously — recall is printed against
     exact brute force over the *current* window.

Runs anywhere (CPU included):
  python examples/streaming_demo.py [--batches 12] [--batch-size 2000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from torchpq_tpu.clustering import MinibatchKMeans
from torchpq_tpu.index import IVFPQIndex


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=2000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--window", type=int, default=4,
                    help="keep the last N batches in the index")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    d, b = args.d, args.batch_size

    def next_batch(i):
        # drifting cluster structure: centers shift a little every batch
        centers = rng.standard_normal((32, d)).astype(np.float32)
        lab = rng.integers(0, 32, b)
        return (centers[lab] + 0.3 * rng.standard_normal((b, d))
                ).astype(np.float32).T  # [d, n] reference layout

    # 1. online coarse clustering over the stream
    mbk = MinibatchKMeans(n_clusters=32)
    warmup = [next_batch(i) for i in range(2)]
    for x in warmup:
        mbk.fit_minibatch(jnp.asarray(x))
    print(f"warmed up: inertia={float(mbk.inertia):.3f}")

    # 2. one-time index training on the warmup window
    index = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=32,
                       initial_size=4 * b)
    index.train(jnp.concatenate([jnp.asarray(x) for x in warmup], axis=1))
    index.n_probe = 8

    # 3. continuous ingest + evict + serve
    window = []  # [(ids, batch)]
    for i in range(args.batches):
        x = next_batch(i)
        ids = np.asarray(index.add(jnp.asarray(x)))
        window.append((ids, x))
        if len(window) > args.window:
            old_ids, _ = window.pop(0)
            index.remove(ids=jnp.asarray(old_ids))
        mbk.fit_minibatch(jnp.asarray(x))  # keep the online model current

        # serve: 32 queries from the newest batch, recall vs brute force
        q = x[:, :32]
        _, got = index.search(jnp.asarray(q), k=1)
        got = np.asarray(got)[:, 0]
        live = np.concatenate([w[1] for w in window], axis=1)
        live_ids = np.concatenate([w[0] for w in window])
        sims = (2.0 * q.T @ live
                - (live * live).sum(0)[None, :])   # argmax = nearest
        want = live_ids[np.argmax(sims, axis=1)]
        rec = float((got == want).mean())
        print(f"batch {i}: n_items={index.n_items}  "
              f"stream-inertia={float(mbk.inertia):.3f}  "
              f"recall@1(vs live window)={rec:.3f}")


if __name__ == "__main__":
    main()
