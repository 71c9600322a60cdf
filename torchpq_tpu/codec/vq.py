"""Vector-quantizer codec — wraps KMeans (reference torchpq/codec/VQCodec.py).
Used as the IVF coarse quantizer by IVFPQIndex."""

import jax.numpy as jnp

from .base import BaseCodec
from ..clustering import KMeans


class VQCodec(BaseCodec):
    def __init__(self, *args, verbose=0, **kwargs):
        super().__init__(verbose=verbose)
        self.register_module("kmeans", KMeans(*args, verbose=verbose, **kwargs))

    @property
    def codebook(self):
        """[d_vector, n_clusters] (reference VQCodec.py:16-17)."""
        return self.kmeans.centroids if self.is_trained else None

    def train(self, data):
        """data: [d_vector, n]. (reference VQCodec.py:49-58)."""
        self.kmeans.fit(jnp.asarray(data))
        self._set_trained()

    def encode(self, x):
        """x: [d_vector, n] -> cell labels [n] int32 (reference :19-32)."""
        assert self.is_trained, "codec is not trained"
        return self.kmeans.predict(x)

    def decode(self, code):
        """labels [n] -> centroid columns [d_vector, n] (reference :34-47)."""
        assert self.is_trained, "codec is not trained"
        return self.kmeans.centroids[:, jnp.asarray(code)]
