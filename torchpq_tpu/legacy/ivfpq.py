"""v1 IVFPQ / IVFPQR adapters (reference legacy/IVFPQ.py, legacy/IVFPQR.py)."""

import numpy as np
import jax.numpy as jnp

from ..index import IVFPQIndex, IVFPQRIndex
from ..codec import SQCodec


class IVFPQ:
    """v1 facade: n_cq_clusters -> n_cells, blocksize -> initial per-cell
    capacity, topk() -> search(). Optional `cpu_quantizer` (an SQCodec)
    enables the CPU-RAM tier: SQ-compressed originals are kept host-side and
    can be reconstructed by address/id (reference legacy/IVFPQBase.py:55-58,
    :520-526)."""

    index_cls = IVFPQIndex

    def __init__(self, d_vector, n_subvectors=8, n_cq_clusters=128,
                 n_pq_clusters=256, blocksize=64, verbose=0,
                 distance="euclidean", cpu_quantizer=None, device=None,
                 **kwargs):
        assert n_pq_clusters == 256, \
            "only 256 PQ clusters are supported (like the reference)"
        self._index = self.index_cls(
            d_vector=d_vector, n_subvectors=n_subvectors,
            n_cells=n_cq_clusters, initial_size=blocksize,
            distance=distance, verbose=verbose, **kwargs)
        self.cpu_quantizer = cpu_quantizer
        self._cpu_store = {}  # id -> np compressed row

    # -- v1 names --
    def train(self, input, force_retrain=False):
        if self.cpu_quantizer is not None and not self.cpu_quantizer.is_trained:
            self.cpu_quantizer.train(jnp.asarray(input))
        return self._index.train(input, force_retrain=force_retrain)

    def add(self, input, input_ids=None, return_address=False):
        out = self._index.add(input, ids=input_ids,
                              return_address=return_address)
        ids = out[0] if return_address else out
        if self.cpu_quantizer is not None:
            codes = np.asarray(self.cpu_quantizer.encode(jnp.asarray(input)))
            for j, i in enumerate(np.asarray(ids)):
                self._cpu_store[int(i)] = codes[:, j]
        return out

    def remove(self, remove_ids):
        for i in np.asarray(remove_ids):
            self._cpu_store.pop(int(i), None)
        return self._index.remove(ids=remove_ids)

    def remove_address(self, address):
        return self._index.remove(address=address)

    def encode(self, input):
        return self._index.encode(input)

    def decode(self, code):
        return self._index.decode(code)

    def topk(self, query, k, mode=2, return_address=False):
        """v1 search entry (reference legacy/IVFPQ.py:315-349); `mode` chose
        among scan strategies there — both modes map to the fused scan."""
        del mode
        return self._index.search(query, k=k, return_address=return_address)

    def similarity_at_address(self, query, address):
        return self._index.similarity_at_address(query, address)

    def similarity_at_id(self, query, ids):
        return self._index.similarity_at_id(query, ids)

    def reconstruct_from_cpu_ram(self, ids):
        """Reconstruct originals from the CPU-RAM SQ tier -> [d, n]."""
        assert self.cpu_quantizer is not None, "no cpu_quantizer configured"
        codes = np.stack([self._cpu_store[int(i)] for i in np.asarray(ids)],
                         axis=1)
        return self.cpu_quantizer.decode(jnp.asarray(codes))

    # passthroughs
    @property
    def n_probe(self):
        return self._index.n_probe

    @n_probe.setter
    def n_probe(self, v):
        self._index.n_probe = v

    def __getattr__(self, name):
        # guard: during pickle/deepcopy (and before __init__ finishes)
        # '_index' itself may be missing; re-entering getattr(self._index)
        # would recurse forever
        try:
            index = self.__dict__["_index"]
        except KeyError:
            raise AttributeError(name) from None
        return getattr(index, name)


class IVFPQR(IVFPQ):
    """v1 IVFPQR facade over the (correct) IVFPQRIndex."""

    index_cls = IVFPQRIndex

    def __init__(self, d_vector, n_subvectors=8, n_subq=8, n_cq_clusters=128,
                 n_pq_clusters=256, blocksize=64, verbose=0,
                 distance="euclidean", cpu_quantizer=None, device=None,
                 **kwargs):
        super().__init__(
            d_vector, n_subvectors=n_subvectors, n_cq_clusters=n_cq_clusters,
            n_pq_clusters=n_pq_clusters, blocksize=blocksize, verbose=verbose,
            distance=distance, cpu_quantizer=cpu_quantizer,
            n_subvectors_rerank=n_subq, **kwargs)
