"""Where do the warm-add 19.9 s go? (r4 BENCH add_warm_s=19.92 vs the r3
measured 12.0 with bf16+prefetch+device-spill; T4 baseline 10.72.)

Times, at the exact bench shape (1M x 128d, 4 x 250k chunks, warm):
  wire   — device_put of all chunks (host bf16 cast + H2D), block at end
  compute— add() over pre-staged device chunks (the --ingest device number)
  loop   — the bench's actual prefetch loop (wire under compute)
  +ids   — same loop plus the cold path's per-chunk np.asarray(ids) D2H
Upper-bounds what overlap can save and records whether the tunnel alone
explains the gap (VERDICT r4 #6's decision evidence).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

from bench import make_data
from torchpq_tpu.index import IVFPQIndex

CHUNK = 250_000


def fresh_index(n_base, d, n_cells, m):
    ix = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                    initial_size=(n_base // n_cells) * 3)
    ix.use_approx_topk = True
    ix.spill_cells = 8
    ix.spill_capacity = ix.max_cell_capacity
    ix.scan_group = 4
    return ix


def main():
    n_base, d, n_cells, m = 1_000_000, 128, 4096, 64
    base, _ = make_data(n_base, 100, d, spectrum="manifold-12")
    trained = fresh_index(n_base, d, n_cells, m)
    trained.train(jnp.asarray(base[:100_000]).T)
    cents = trained.vq_codec.kmeans._centroids
    pq_cb = trained.pq_codec.kmeans._centroids
    print("trained", flush=True)

    def warm_clone():
        ix = fresh_index(n_base, d, n_cells, m)
        ix.vq_codec.kmeans._centroids = cents   # is_trained derives from it
        ix.vq_codec._set_trained(True)
        ix.pq_codec.kmeans._centroids = pq_cb
        ix.pq_codec._set_trained(True)
        return ix

    # compile warmup
    ix = warm_clone()
    for i in range(4):
        ix.add(jnp.asarray(base[i * CHUNK:(i + 1) * CHUNK]
                           .astype(ml_dtypes.bfloat16)).T)
    print("warmed", flush=True)

    # host-side bf16 cast cost (single core)
    t0 = time.perf_counter()
    casted = [base[i:i + CHUNK].astype(ml_dtypes.bfloat16)
              for i in range(0, n_base, CHUNK)]
    print(f"host f32->bf16 cast 1M: {time.perf_counter() - t0:.2f}s",
          flush=True)

    # wire: H2D of all chunks, nothing else
    t0 = time.perf_counter()
    devs = [jnp.asarray(c) for c in casted]
    jax.block_until_ready(devs)
    wire_s = time.perf_counter() - t0
    print(f"wire (4 x 250k bf16 H2D): {wire_s:.2f}s "
          f"({256 / wire_s:.0f} MB/s)", flush=True)

    # compute: pre-staged add
    ix = warm_clone()
    t0 = time.perf_counter()
    for cur in devs:
        last = ix.add(cur.T)
    jax.block_until_ready(last)
    jax.effects_barrier()
    comp_s = time.perf_counter() - t0
    print(f"compute (pre-staged add): {comp_s:.2f}s", flush=True)

    # the bench loop (prefetch: H2D under compute)
    send = lambda a: jnp.asarray(a.astype(ml_dtypes.bfloat16))
    ix = warm_clone()
    t0 = time.perf_counter()
    nxt = send(base[0:CHUNK])
    for i in range(0, n_base, CHUNK):
        cur, j = nxt, i + CHUNK
        if j < n_base:
            nxt = send(base[j:j + CHUNK])
        last = ix.add(cur.T)
    jax.block_until_ready(last)
    jax.effects_barrier()
    loop_s = time.perf_counter() - t0
    print(f"bench prefetch loop: {loop_s:.2f}s "
          f"(ideal overlap = max(wire, compute) = "
          f"{max(wire_s, comp_s):.2f}s)", flush=True)

    # cold-path variant: per-chunk np.asarray(ids) D2H sync
    ix = warm_clone()
    t0 = time.perf_counter()
    nxt = send(base[0:CHUNK])
    outs = []
    for i in range(0, n_base, CHUNK):
        cur, j = nxt, i + CHUNK
        if j < n_base:
            nxt = send(base[j:j + CHUNK])
        outs.append(np.asarray(ix.add(cur.T)))
    jax.effects_barrier()
    print(f"loop + per-chunk np.asarray(ids): "
          f"{time.perf_counter() - t0:.2f}s", flush=True)

    # does a plain device_put actually overlap compute on this tunnel?
    ix = warm_clone()
    dev0 = devs[0]
    t0 = time.perf_counter()
    r = ix.add(dev0.T)
    h = jnp.asarray(casted[1])          # dispatched while add runs?
    jax.block_until_ready((r, h))
    both = time.perf_counter() - t0
    print(f"one add + one H2D concurrently: {both:.2f}s "
          f"(serial would be ~{comp_s / 4 + wire_s / 4:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
