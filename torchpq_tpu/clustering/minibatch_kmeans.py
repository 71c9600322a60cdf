"""Online (mini-batch) k-means.

Reference counterpart: torchpq/clustering/MinibatchKMeans.py — persistent
`n_points_in_clusters` counts, per-batch assignment, EMA centroid update with
per-cluster learning rate 1/count (:406-450), `inertia`/`error` properties
(:117-123). The whole step is one jitted function here.
"""

import functools

import jax
import jax.numpy as jnp

from .. import util
from ..metric import canonical_distance
from ..module import StateModule
from ..ops.max_sim import max_sim, topk_sim
from ..ops.segment_ops import compute_centroids
from . import lloyd


@functools.partial(jax.jit, static_argnames=("n_clusters", "distance"))
def _minibatch_step(data, centroids, counts, *, n_clusters, distance):
    """data [n, d]; returns (new_centroids, new_counts, inertia, error)."""
    maxs, labels = max_sim(data, centroids, distance)
    sums, batch_counts = compute_centroids(data, labels, n_clusters)
    new_counts = counts + batch_counts
    # per-cluster learning rate 1/total_count (MinibatchKMeans.py:406-450)
    lr = jnp.where(new_counts > 0, batch_counts / jnp.maximum(new_counts, 1.0),
                   0.0)
    batch_mean = sums / jnp.maximum(batch_counts, 1.0)[:, None]
    new_c = centroids + lr[:, None] * (batch_mean - centroids)
    new_c = jnp.where((batch_counts > 0)[:, None], new_c, centroids)
    if canonical_distance(distance) == "cosine":
        new_c = util.normalize(new_c)
    error = jnp.sum(jnp.square(new_c - centroids))
    inertia = -jnp.mean(maxs)
    return new_c, new_counts, inertia, error


class MinibatchKMeans(StateModule):
    def __init__(self, n_clusters, distance="euclidean", init_mode="random",
                 verbose=0, sm_size=None, seed=0):
        super().__init__(verbose=verbose)
        del sm_size
        self.n_clusters = n_clusters
        self.distance = canonical_distance(distance)
        self.init_mode = init_mode
        self.seed = seed
        self.register_state("_centroids", None)  # [k, d]
        self.register_state("_n_points_in_clusters", None)  # [k] f32
        self.register_state("_inertia", float("nan"))
        self.register_state("_error", float("nan"))

    @property
    def centroids(self):
        return None if self._centroids is None else self._centroids.T

    @property
    def n_points_in_clusters(self):
        return self._n_points_in_clusters

    @property
    def inertia(self):
        return self._inertia

    @property
    def error(self):
        return self._error

    @property
    def is_trained(self):
        return self._centroids is not None

    def _to_internal(self, data):
        data = jnp.asarray(data)
        assert data.ndim == 2, f"expected [d_vector, n_data], got {data.shape}"
        x = data.T.astype(jnp.float32)
        if self.distance == "cosine":
            x = util.normalize(x)
        return x

    def fit_minibatch(self, data, centroids=None):
        """One online update with a batch [d_vector, n]. Returns labels [n]."""
        x = self._to_internal(data)
        if centroids is not None:
            self.register_state("_centroids", jnp.asarray(centroids).T)
            self.register_state(
                "_n_points_in_clusters",
                jnp.zeros(self.n_clusters, jnp.float32))
        if self._centroids is None:
            if self.init_mode == "kmeans++":
                cents = lloyd._init_kmeanspp(
                    x[None], jax.random.PRNGKey(self.seed), self.n_clusters,
                    self.distance)[0]
            else:
                cents = lloyd._init_random(
                    x[None], jax.random.PRNGKey(self.seed), self.n_clusters)[0]
            self.register_state("_centroids", cents)
            self.register_state(
                "_n_points_in_clusters",
                jnp.zeros(self.n_clusters, jnp.float32))
        new_c, new_counts, inertia, error = _minibatch_step(
            x, self._centroids, self._n_points_in_clusters,
            n_clusters=self.n_clusters, distance=self.distance)
        self.register_state("_centroids", new_c)
        self.register_state("_n_points_in_clusters", new_counts)
        self.register_state("_inertia", float(inertia))
        self.register_state("_error", float(error))
        _, labels = max_sim(x, new_c, self.distance)
        return labels

    def predict(self, query):
        assert self.is_trained, "not trained"
        x = self._to_internal(query)
        _, labels = max_sim(x, self._centroids, self.distance)
        return labels

    def topk(self, query, k=128):
        assert self.is_trained
        x = self._to_internal(query)
        return topk_sim(x, self._centroids, k, self.distance)
