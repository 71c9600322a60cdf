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
from .ivfpq import IVFPQIndex, _write_rows


@functools.partial(
    jax.jit, static_argnames=("chunk", "out_dtype", "residual"))
def _full_cache_chunk(storage, rerank_codes, cell_start, pq_codebook,
                      rr_codebook, vq_rows, c0, *, chunk, out_dtype,
                      residual):
    """One [chunk, d] block of the two-stage reconstruction cache,
    recomputed from the canonical base + rerank codes (relayout
    rebuilder; see IVFPQIndex._rebuild_scan_cache)."""
    from ..codec.pq import _decode_nd
    m, _, dsub = pq_codebook.shape
    mr, _, dsubr = rr_codebook.shape
    codes = jax.lax.dynamic_slice(storage, (c0, 0), (chunk, storage.shape[1]))
    rcodes = jax.lax.dynamic_slice(
        rerank_codes, (c0, 0), (chunk, rerank_codes.shape[1]))
    dec = _decode_nd(codes, pq_codebook, m=m, dsub=dsub)
    if residual:
        idx = c0 + jnp.arange(chunk)
        cell = jnp.clip(jnp.searchsorted(cell_start, idx, side="right") - 1,
                        0, cell_start.shape[0] - 1)
        dec = dec + vq_rows[cell]
    dec = dec + _decode_nd(rcodes, rr_codebook, m=mr, dsub=dsubr)
    nrm = jnp.sum(jnp.square(dec), axis=-1, keepdims=True)
    return dec.astype(out_dtype), nrm


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
        assert not self._int8_cache, \
            "IVFPQRIndex requires a float scan cache (the rerank stage " \
            "scores against decoded_full directly)"
        self.set_aux_rebuilder(
            ("decoded", "norm", "decoded_full", "norm_full"),
            self._rebuild_scan_cache)

    def _rebuild_scan_cache(self):
        out = super()._rebuild_scan_cache()
        cap, d = self._capacity, self.d_vector
        dec_dt = self._aux["decoded_full"][1]
        chunk = min(cap, util.next_pow2(max(16384, (1 << 27) // max(d, 1))))
        vq_rows = (self.vq_codec.kmeans._centroids[0]
                   if self.pq_use_residual else None)
        dec = jnp.zeros((cap, d), dec_dt)
        nrm = jnp.zeros((cap, 1), jnp.float32)
        for i in range(util.cdiv(cap, chunk)):
            c0 = min(i * chunk, cap - chunk)
            db, nb = _full_cache_chunk(
                self._storage, self.aux("rerank_codes"), self._cell_start,
                self.pq_codec.codebook_internal,
                self.rerank_codec.codebook_internal, vq_rows, c0,
                chunk=chunk, out_dtype=dec_dt, residual=self.pq_use_residual)
            dec = _write_rows(dec, db, c0)
            nrm = _write_rows(nrm, nb, c0)
        out["decoded_full"] = dec
        out["norm_full"] = nrm
        return out

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
        cells = self._assign_cells(x)  # honors spill_cells/spill_capacity
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
