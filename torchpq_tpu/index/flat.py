"""Exact (brute-force) index.

Reference counterpart: torchpq/index/FlatIndex.py — full distance matrix via
metric.* then fn.Topk (:45-102). Distance aliases l2/angular/dot accepted
(:31-40). The reference does not support manhattan here (:37-38); we do (the
VPU broadcast path in metric handles it).

The scorer runs as one jit: candidate norms are computed once per call and
shared across query chunks; queries chunk via lax.map so the [chunk, cap]
score tile bounds memory.
"""

import functools

import jax
import jax.numpy as jnp

from .. import util
from ..metric import canonical_distance, preprocess_query
from ..container import FlatContainer
from ..fn import topk as fn_topk


@functools.partial(jax.jit,
                   static_argnames=("k", "distance", "q_chunk", "precision"))
def _flat_search(query, storage, address2id, n_items, *, k, distance,
                 q_chunk=256, precision=None):
    nq, d = query.shape
    cap = storage.shape[0]
    col_valid = (jnp.arange(cap) < n_items) & (address2id >= 0)
    if distance == "euclidean":
        s_sq = jnp.sum(jnp.square(storage.astype(jnp.float32)), axis=-1)
    else:
        s_sq = None

    # add() stores unit rows and the query is pre-normalized for cosine,
    # so scoring reduces to the inner product — avoids re-normalizing the
    # whole [cap, d] cache inside every chunk
    eff_distance = "inner" if distance == "cosine" else distance

    def score(q):  # [c, d] -> [c, cap]
        from ..metric import similarity
        sims = similarity(q, storage.astype(jnp.float32), eff_distance,
                          precision=precision, b_sq=s_sq)
        return jnp.where(col_valid[None, :], sims, -jnp.inf)

    def one_chunk(q):
        sims = score(q)
        vals, idx = jax.lax.top_k(sims, min(k, cap))
        return vals, idx

    q_pad, _ = util.pad_rows(query, q_chunk)
    blocks = q_pad.reshape(-1, q_chunk, d)
    vals, idx = jax.lax.map(one_chunk, blocks)
    vals = vals.reshape(-1, vals.shape[-1])[:nq]
    idx = idx.reshape(-1, idx.shape[-1])[:nq]
    ids = jnp.where(jnp.isfinite(vals), address2id[idx], -1)
    addr = jnp.where(jnp.isfinite(vals), idx, -1)
    return vals, ids, addr


class FlatIndex(FlatContainer):
    def __init__(self, d_vector, initial_size=None, expand_step_size=1024,
                 expand_mode="double", distance="euclidean", device=None,
                 verbose=0):
        super().__init__(
            code_size=d_vector, dtype="float32", device=device,
            initial_size=initial_size, expand_step_size=expand_step_size,
            expand_mode=expand_mode, use_inverse_id_mapping=True,
            verbose=verbose)
        self.d_vector = d_vector
        self.distance = canonical_distance(distance)

    def add(self, data, ids=None, return_address=False):
        data = jnp.asarray(data).astype(jnp.float32)
        if self.distance == "cosine":
            data = util.normalize(data, axis=0)
        return super().add(data, ids=ids, return_address=return_address)

    def search(self, x, k=1, return_address=False):
        """x: [d_vector, nq] -> (values [nq, k], ids [nq, k])
        (reference FlatIndex.search, :45-102)."""
        x = jnp.asarray(x)
        assert x.shape[0] == self.d_vector
        q = preprocess_query(x.T.astype(jnp.float32), self.distance)
        k_eff = max(int(k), 1)
        vals, ids, addr = _flat_search(
            q, self._storage, self._address2id, jnp.int32(self._n_items),
            k=k_eff, distance=self.distance)
        if vals.shape[-1] < k:
            pad = int(k) - vals.shape[-1]
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            addr = jnp.pad(addr, ((0, 0), (0, pad)), constant_values=-1)
        if return_address:
            return vals, ids, addr
        return vals, ids
