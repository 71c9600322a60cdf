"""v1 IVFPQTopk adapter.

Reference counterpart: legacy/IVFPQTopk.py — the v1 scan strategy computed
the FULL similarity list of all probed codes (compute_product.cu) and sorted
it externally (:50-122). Here it adapts onto the fused scan ops; a
`scores(...)` helper reproduces the "materialize all probed similarities"
behaviour for callers that used the raw lists.
"""

import jax
import jax.numpy as jnp

from .. import util
from ..ops import adc


class IVFPQTopk:
    def __init__(self, n_subvectors=8, n_clusters=256, n_cs=4, **kwargs):
        del n_cs  # uchar4 interleave factor — CUDA-ism
        self.n_subvectors = n_subvectors
        self.n_clusters = n_clusters

    @staticmethod
    def topk(query, codebook_internal, codes, k, distance="euclidean"):
        """Brute ADC top-k over an explicit code list.

        query: [nq, d] rows; codebook_internal: [m, 256, dsub];
        codes: [n, m] uint8 -> (values [nq, k], indices [nq, k]).
        """
        if distance == "cosine":  # build_adc_table precondition
            query = util.normalize(jnp.asarray(query), axis=-1)
        lut = adc.build_adc_table(query, codebook_internal, distance)
        scores = adc.adc_lookup_scores(lut, codes)
        return jax.lax.top_k(scores, min(k, scores.shape[-1]))

    @staticmethod
    def scores(query, codebook_internal, codes, distance="euclidean"):
        """Full similarity list, like the v1 compute_product path."""
        if distance == "cosine":
            query = util.normalize(jnp.asarray(query), axis=-1)
        lut = adc.build_adc_table(query, codebook_internal, distance)
        return adc.adc_lookup_scores(lut, codes)
