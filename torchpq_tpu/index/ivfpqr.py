"""IVFPQ + re-ranking index — implemented *correctly*.

Reference counterpart: torchpq/index/IVFPQRIndex.py, which is declared intent
only (its train fits the base codec twice, add raises NameError and search
raises NotImplementedError — SURVEY.md §2.7). The intended design — a second
PQ codec over the first codec's residual, used to re-rank a widened candidate
list — is implemented here:

* rerank codes live in an aux row store next to the base codes (the reference
  planned code_size = m + m_rerank in one buffer, IVFPQRIndex.py:28-39);
* the base scan uses the coarse (first-stage) decoded cache; re-ranking
  rescores the top k * rerank_multiplier candidates against the full
  two-stage reconstruction cache with one gather + batched matvec.
"""

import functools

import jax
import jax.numpy as jnp

from .. import util
from ..codec import PQCodec
from ..ops.adc import _block_scores
from .ivfpq import IVFPQIndex


@functools.partial(jax.jit, static_argnames=("k", "distance"))
def _rerank(q, cand_addr, decoded_full, norm_full, *, k, distance):
    valid = cand_addr >= 0
    safe = jnp.where(valid, cand_addr, 0)
    cand = decoded_full[safe]                       # [nq, k', d]
    cand_sq = norm_full[safe]                       # [nq, k']
    sims = _block_scores(q[:, None, :], cand, cand_sq, distance)[:, 0, :]
    sims = jnp.where(valid, sims, -jnp.inf)
    vals, idx = jax.lax.top_k(sims, min(k, sims.shape[-1]))
    addr = jnp.take_along_axis(cand_addr, idx, axis=1)
    addr = jnp.where(jnp.isfinite(vals), addr, -1)
    return vals, addr


class IVFPQRIndex(IVFPQIndex):
    def __init__(self, d_vector, n_subvectors=8, n_subvectors_rerank=8,
                 n_cells=128, rerank_multiplier=4, **kwargs):
        super().__init__(d_vector, n_subvectors=n_subvectors,
                         n_cells=n_cells, **kwargs)
        assert d_vector % n_subvectors_rerank == 0
        self.n_subvectors_rerank = n_subvectors_rerank
        self.rerank_multiplier = int(rerank_multiplier)
        self.add_aux_store("rerank_codes", n_subvectors_rerank, "uint8")
        self.add_aux_store("decoded_full", d_vector,
                           self._aux["decoded"][1])
        self.add_aux_store("norm_full", 1, "float32")
        self.register_module("rerank_codec", PQCodec(
            d_vector=d_vector, n_subvectors=n_subvectors_rerank,
            n_clusters=256, distance=self.distance,
            verbose=kwargs.get("verbose", 0)))

    @property
    def is_trained(self):
        return super().is_trained and self.rerank_codec.is_trained

    def train(self, x, force_retrain=False):
        if self.is_trained and not force_retrain:
            self.print_message("index is already trained", 1)
            return
        x = jnp.asarray(x).astype(jnp.float32)
        super().train(x, force_retrain=force_retrain)
        # second-stage residual: x minus the full first-stage reconstruction
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        first = self.encode(x)
        recon = self.decode(first)
        self.rerank_codec.train(x - recon)
        self.print_message("rerank codec trained", 1)

    def add(self, x, ids=None, return_address=False):
        x = jnp.asarray(x).astype(jnp.float32)
        assert self.is_trained, "train the index first"
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        x_nd = x.T
        cells = self.vq_codec.encode(x)
        if self.pq_use_residual:
            coarse = self.vq_codec.decode(cells).T
            codes_nm = self.pq_codec.encode_nd(x_nd - coarse)
            decoded = coarse + self.pq_codec.decode_nd(codes_nm)
        else:
            codes_nm = self.pq_codec.encode_nd(x_nd)
            decoded = self.pq_codec.decode_nd(codes_nm)
        resid2 = x_nd - decoded
        rcodes_nm = self.rerank_codec.encode_nd(resid2)
        decoded_full = decoded + self.rerank_codec.decode_nd(rcodes_nm)
        norms = jnp.sum(jnp.square(decoded), axis=-1, keepdims=True)
        norms_full = jnp.sum(jnp.square(decoded_full), axis=-1, keepdims=True)
        from ..container.cell import CellContainer
        return CellContainer.add(
            self, codes_nm.T, cells, ids=ids, return_address=return_address,
            aux_rows={"decoded": decoded, "norm": norms,
                      "rerank_codes": rcodes_nm,
                      "decoded_full": decoded_full, "norm_full": norms_full})

    def search(self, x, k=1, return_address=False):
        """Two-stage search: base IVFPQ scan widened by rerank_multiplier,
        then exact re-rank against the two-stage reconstruction."""
        x = jnp.asarray(x).astype(jnp.float32)
        assert x.shape[0] == self.d_vector
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        k_base = int(k) * self.rerank_multiplier
        _, _, cand_addr = super().search(x, k=k_base, return_address=True)
        q = x.T
        vals, addr = _rerank(
            q, cand_addr, self.aux("decoded_full"),
            self.aux("norm_full")[:, 0], k=int(k), distance=self.distance)
        ids = self.get_id_by_address(addr)
        ids = jnp.where(addr >= 0, ids, -1)
        if vals.shape[-1] < k:
            pad = int(k) - vals.shape[-1]
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            addr = jnp.pad(addr, ((0, 0), (0, pad)), constant_values=-1)
        if return_address:
            return vals, ids, addr
        return vals, ids
