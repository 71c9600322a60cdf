"""Drive the packed-at-ingest code-domain tier + Pallas codes kernel on real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.ops import adc

rng = np.random.default_rng(0)
n, d, nq = 200_000, 128, 1024
data = rng.standard_normal((n, d), dtype=np.float32)
queries = data[rng.choice(n, nq, replace=False)] + 0.1 * rng.standard_normal((nq, d), dtype=np.float32)

# ground truth (euclidean) via torch-free numpy blocks
gt = []
qn = (queries ** 2).sum(1)
for i in range(0, nq, 256):
    q = queries[i:i + 256]
    dist = ((data ** 2).sum(1)[None, :] - 2 * q @ data.T)
    gt.append(np.argsort(dist, axis=1)[:, :10])
gt = np.concatenate(gt)

index = IVFPQIndex(d_vector=d, n_subvectors=64, n_cells=1024,
                   scan_cache_dtype="none", verbose=1)
print("pack_group:", index.pack_group, flush=True)
t0 = time.time()
index.train(data[:100_000].T)
print(f"train {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
index.add(data.T)
jax.block_until_ready(index._storage)
print(f"add {time.time()-t0:.1f}s storage shape {index._storage.shape}", flush=True)

qT = jnp.asarray(queries.T)
index.scan_mode = "cell_major"
for np_ in (8, 32):
    index.n_probe = np_
    _, ids = index.search(qT, k=10)
    ids = np.asarray(jax.block_until_ready(ids))
    r10 = float(np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10 for i in range(nq)]))
    print(f"np={np_} gate={dict(adc.LAST_GATE)} recall@10={r10:.3f}", flush=True)
    # timed
    t0 = time.time()
    for _ in range(5):
        _, ids = index.search(qT, k=10)
    jax.block_until_ready(ids)
    dt = (time.time() - t0) / 5
    print(f"np={np_} {nq/dt:,.0f} q/s ({dt*1e3:.2f} ms/batch)", flush=True)
print("OK", flush=True)
