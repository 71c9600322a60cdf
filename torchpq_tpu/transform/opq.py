"""OPQ — Optimized Product Quantization.

The reference declares OPQ but ships an empty stub
(torchpq/transform/OPQ.py:1-3). This is a working implementation of the
non-parametric OPQ of Ge et al., CVPR 2013: alternate between (a) fitting PQ
codebooks on the rotated data and (b) solving the orthogonal Procrustes
problem R* = U V^T from SVD(Y X^T) to minimize ||R X - Y||_F, where Y is the
current PQ reconstruction. Both steps are MXU matmuls / small SVDs.
"""

import jax.numpy as jnp

from ..codec import PQCodec
from ..codec.base import BaseCodec


class OPQ(BaseCodec):
    def __init__(self, d_vector, n_subvectors=8, n_clusters=256,
                 distance="euclidean", n_iter=8, pq_max_iter=10, verbose=0,
                 seed=0):
        super().__init__(verbose=verbose)
        self.d_vector = d_vector
        self.n_subvectors = n_subvectors
        self.n_iter = int(n_iter)
        self.register_state("_rotation", jnp.eye(d_vector))  # [d, d]
        self.register_module("pq", PQCodec(
            d_vector=d_vector, n_subvectors=n_subvectors,
            n_clusters=n_clusters, distance=distance, verbose=verbose,
            max_iter=pq_max_iter, seed=seed))

    @property
    def rotation(self):
        return self._rotation

    @property
    def codebook(self):
        return self.pq.codebook

    def train(self, x):
        """x: [d_vector, n]."""
        x = jnp.asarray(x).astype(jnp.float32)
        assert x.shape[0] == self.d_vector
        r = self._rotation
        warm = None  # previous round's codebooks (non-parametric OPQ,
        for it in range(self.n_iter):  # Ge et al.: refine, don't restart)
            xr = r @ x
            self.pq.train(xr, centroids=warm)
            self.pq._set_trained(True)
            recon = self.pq.decode(self.pq.encode(xr))  # Y: [d, n]
            # Procrustes: R = U V^T from SVD(Y X^T)
            m = recon @ x.T
            u, _, vt = jnp.linalg.svd(m, full_matrices=False)
            r = u @ vt
            err = float(jnp.mean(jnp.square(r @ x - recon)))
            self.print_message(f"OPQ iter {it}: distortion {err:.6g}", 1)
            warm = self.pq.codebook
            self.pq._set_trained(False)
        self._rotation = r
        self.register_state("_rotation", r)
        self.pq.train(r @ x, centroids=warm)
        self._set_trained(True)

    def rotate(self, x):
        """Apply the learned orthogonal rotation only ([d, n] -> [d, n]) —
        for pipelines that feed rotated vectors to their own index/codec."""
        assert self.is_trained
        return self._rotation @ jnp.asarray(x)

    def encode(self, x):
        assert self.is_trained
        return self.pq.encode(self._rotation @ jnp.asarray(x))

    def decode(self, code):
        assert self.is_trained
        return self._rotation.T @ self.pq.decode(code)
