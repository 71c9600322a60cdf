"""Bisect the Pallas codes-scan recall failure on real TPU.

Same tiny index searched three ways: XLA one-hot impl, Pallas in interpret
mode (pure-JAX lowering on the TPU backend), Pallas compiled by Mosaic.
Agreement pattern localizes the bug (ingest vs kernel vs Mosaic lowering).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from torchpq_tpu import config
from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.ops import adc

rng = np.random.default_rng(0)
n, d, nq = 20_000, 128, 128
data = rng.standard_normal((n, d), dtype=np.float32)
queries = data[rng.choice(n, nq, replace=False)] + 0.05 * rng.standard_normal(
    (nq, d), dtype=np.float32)
gt = []
for i in range(0, nq, 64):
    q = queries[i:i + 64]
    dist = (data ** 2).sum(1)[None, :] - 2 * q @ data.T
    gt.append(np.argsort(dist, axis=1)[:, :10])
gt = np.concatenate(gt)

index = IVFPQIndex(d_vector=d, n_subvectors=64, n_cells=64,
                   scan_cache_dtype="none", verbose=0)
index.train(data[:10_000].T)
index.add(data.T)
print("pack_group:", index.pack_group, "storage:", index._storage.shape,
      flush=True)
index.n_probe = 8
index.scan_mode = "cell_major"  # force the codes cell-major scan
qT = jnp.asarray(queries.T)


def recall(ids):
    ids = np.asarray(jax.block_until_ready(ids))
    return float(np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
                          for i in range(nq)]))


for label, impl, interp in (("xla", "xla", False),
                            ("pallas-interpret", "pallas", True),
                            ("pallas-mosaic", "pallas", False)):
    config.PALLAS_INTERPRET = interp
    index.scan_impl = impl
    _, ids = index.search(qT, k=10)
    print(f"{label:18s} gate={dict(adc.LAST_GATE)}", flush=True)
    print(f"{label:18s} recall@10={recall(ids):.3f}", flush=True)
