"""KMeans / MultiKMeans class shells (reference: torchpq/clustering/KMeans.py,
MultiKMeans.py). API-parity notes:

* constructor signature matches the reference (KMeans.py:46-56); `sm_size` is
  accepted-and-ignored (CUDA shared-memory tuning has no TPU meaning).
* data layout is the reference's feature-major: KMeans.fit takes
  [d_vector, n_data]; MultiKMeans.fit takes [m, d_subvector, n_data]
  (what PQCodec feeds it, codec/PQCodec.py:48-60).
* `centroids` buffer is exposed in the reference layout ([d, k] resp.
  [m, d, k]); internally row-major.
"""

import jax
import jax.numpy as jnp

from .. import util
from ..metric import (canonical_distance, cosine_similarity,
                      negative_squared_l2_distance, similarity)
from ..module import StateModule
from ..ops.max_sim import max_sim, topk_sim, batched_max_sim
from . import lloyd


class MultiKMeans(StateModule):
    """`m` independent k-means problems solved in one fused run
    (reference clustering/MultiKMeans.py — the engine of PQ training)."""

    def __init__(self, n_clusters, n_redo=1, max_iter=100, tol=1e-4,
                 distance="euclidean", init_mode="random", verbose=0,
                 sm_size=None, seed=0):
        super().__init__(verbose=verbose)
        del sm_size  # CUDA shared-memory knob; meaningless on TPU
        self.n_clusters = n_clusters
        self.n_redo = n_redo
        self.max_iter = max_iter
        self.tol = tol
        self.distance = canonical_distance(distance)
        self.init_mode = init_mode
        self.seed = seed
        self.register_state("_centroids", None)  # internal [m, k, d]

    # -- reference-layout buffer --
    @property
    def centroids(self):
        """[m, d_subvector, n_clusters] like the reference's buffer."""
        if self._centroids is None:
            return None
        return jnp.swapaxes(self._centroids, 1, 2)

    @centroids.setter
    def centroids(self, value):
        self._centroids = None if value is None else jnp.swapaxes(
            jnp.asarray(value), 1, 2)

    @property
    def is_trained(self):
        return self._centroids is not None

    # -- memory probing (reference KMeans.py:119-141) --
    @staticmethod
    def remaining_memory(device=None):
        """Free device memory in bytes (best effort; reference
        KMeans.remaining_memory probes the CUDA allocator)."""
        import jax
        dev = device or jax.devices()[0]
        try:
            stats = dev.memory_stats()
            return stats["bytes_limit"] - stats["bytes_in_use"]
        except Exception:
            return 1 << 33  # unknown backend: assume 8 GiB

    @staticmethod
    def does_it_fit(size, device=None, dtype=jnp.float32):
        return (size * jnp.dtype(dtype).itemsize
                < KMeans.remaining_memory(device))

    # -- static similarity helpers (reference KMeans.py:153-222) --
    @staticmethod
    def cos_sim(a, b):
        return cosine_similarity(a.T, b.T)

    @staticmethod
    def euc_sim(a, b):
        return negative_squared_l2_distance(a.T, b.T)

    def sim(self, a, b):
        return similarity(a.T, b.T, self.distance)

    @staticmethod
    def calculate_error(a, b):
        return jnp.sum(jnp.square(a - b))

    @staticmethod
    def calculate_inertia(maxsims):
        return jnp.mean(-maxsims)

    # -- data plumbing --
    def _to_internal(self, data):
        """[m, d, n] -> [m, n, d] f32."""
        data = jnp.asarray(data)
        assert data.ndim == 3, f"expected [m, d, n], got {data.shape}"
        return jnp.swapaxes(data, 1, 2).astype(jnp.float32)

    def fit(self, data, centroids=None):
        """data: [m, d_subvector, n_data]. Returns labels [m, n].

        Small d_subvector (< 128 lanes) keeps the data feature-major
        ([m, d, n] — the layout it already arrives in) all the way through
        Lloyd: a [m, n, d] array with trailing d below the TPU lane tile
        pays up to 64x HBM padding (ops/max_sim.py dn path)."""
        data = jnp.asarray(data)
        assert data.ndim == 3, f"expected [m, d, n], got {data.shape}"
        dn = data.shape[1] < 128
        x = data.astype(jnp.float32) if dn else self._to_internal(data)
        init = None if centroids is None else jnp.swapaxes(
            jnp.asarray(centroids), 1, 2)
        cents, labels, inertia, iters = lloyd.fit_redo(
            x, jax.random.PRNGKey(self.seed), n_clusters=self.n_clusters,
            n_redo=self.n_redo, max_iter=self.max_iter, tol=self.tol,
            distance=self.distance, init_mode=self.init_mode,
            init_centroids=init, layout="dn" if dn else "nd")
        self.register_state("_centroids", cents)
        self.print_message(
            f"fit done: {int(iters)} iters, inertia={inertia}", 1)
        return labels

    def predict(self, query):
        """query: [m, d_subvector, n] -> labels [m, n]."""
        assert self.is_trained, "kmeans is not trained"
        query = jnp.asarray(query)
        assert query.ndim == 3, f"expected [m, d, n], got {query.shape}"
        if query.shape[1] < 128:  # feature-major path, as in fit
            x = query.astype(jnp.float32)
            if self.distance == "cosine":
                x = util.normalize(x, axis=1)
            _, labels = batched_max_sim(x, self._centroids, self.distance,
                                        layout="dn")
            return labels
        x = self._to_internal(query)
        if self.distance == "cosine":
            x = util.normalize(x)
        _, labels = batched_max_sim(x, self._centroids, self.distance)
        return labels

    def topk(self, query, k=128):
        """Per-problem top-k similarity (reference MultiKMeans.topk) — one
        batched program over all m subproblems."""
        assert self.is_trained
        x = self._to_internal(query)
        if self.distance == "cosine":
            x = util.normalize(x)
        from ..ops.max_sim import batched_topk_sim
        return batched_topk_sim(x, self._centroids, k, self.distance)


class KMeans(MultiKMeans):
    """Single k-means problem (reference clustering/KMeans.py)."""

    @property
    def centroids(self):
        """[d_vector, n_clusters] like the reference buffer."""
        if self._centroids is None:
            return None
        return self._centroids[0].T

    @centroids.setter
    def centroids(self, value):
        self._centroids = None if value is None else jnp.asarray(value).T[None]

    def _to_internal(self, data):
        data = jnp.asarray(data)
        assert data.ndim == 2, f"expected [d_vector, n_data], got {data.shape}"
        return data.T.astype(jnp.float32)[None]

    def fit(self, data, centroids=None):
        """data: [d_vector, n_data]. Returns labels [n]."""
        init = None if centroids is None else jnp.asarray(centroids).T[None]
        x = self._to_internal(data)
        cents, labels, inertia, iters = lloyd.fit_redo(
            x, jax.random.PRNGKey(self.seed), n_clusters=self.n_clusters,
            n_redo=self.n_redo, max_iter=self.max_iter, tol=self.tol,
            distance=self.distance, init_mode=self.init_mode,
            init_centroids=init)
        self.register_state("_centroids", cents)
        self.print_message(
            f"fit done: {int(iters)} iters, inertia={float(inertia[0]):.6g}", 1)
        return labels[0]

    def predict(self, query):
        """query: [d_vector, n] -> labels [n] (reference KMeans.py:440-447)."""
        assert self.is_trained, "kmeans is not trained"
        x = self._to_internal(query)[0]
        if self.distance == "cosine":
            x = util.normalize(x)
        _, labels = max_sim(x, self._centroids[0], self.distance)
        return labels

    def topk(self, query, k=128):
        """(values, indices) of the k best centroids per query
        (reference KMeans.py:449-480)."""
        assert self.is_trained
        x = self._to_internal(query)[0]
        if self.distance == "cosine":
            x = util.normalize(x)
        return topk_sim(x, self._centroids[0], k, self.distance)
