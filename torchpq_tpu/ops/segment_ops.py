"""Label-indexed reductions for k-means updates.

Reference counterpart: torchpq/kernels/cuda/compute_centroids.cu — a
shared-memory atomicAdd scatter of per-cluster sums and counts (:66-86). The
XLA-native equivalent is `jax.ops.segment_sum`, which lowers to the TPU's
sorted-scatter reduction; no atomics exist or are needed.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def compute_centroids(data, labels, n_clusters, weights=None):
    """Mean of rows per label. data [n, d], labels [n] -> [n_clusters, d].

    Empty clusters keep their count at 0; callers decide the reseeding policy
    (the reference keeps the previous centroid because sum/count yields nan —
    we return (sums, counts) handled explicitly upstream).
    """
    if weights is not None:
        data = data * weights[:, None]
        counts = jax.ops.segment_sum(weights, labels, num_segments=n_clusters)
    else:
        counts = jax.ops.segment_sum(
            jnp.ones(data.shape[0], jnp.float32), labels,
            num_segments=n_clusters)
    sums = jax.ops.segment_sum(data, labels, num_segments=n_clusters)
    return sums, counts


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def batched_compute_centroids(data, labels, n_clusters):
    """Multi-problem variant: data [m, n, d], labels [m, n].

    Implemented as one flat segment_sum with per-problem label offsets — the
    same trick the reference's compute_centroids kernel uses with its grid's m
    dimension (compute_centroids.cu:10-86).
    """
    m, n, d = data.shape
    offset = (jnp.arange(m, dtype=labels.dtype) * n_clusters)[:, None]
    flat_labels = (labels + offset).reshape(-1)
    flat_data = data.reshape(m * n, d)
    sums = jax.ops.segment_sum(flat_data, flat_labels,
                               num_segments=m * n_clusters)
    counts = jax.ops.segment_sum(
        jnp.ones(m * n, jnp.float32), flat_labels,
        num_segments=m * n_clusters)
    return sums.reshape(m, n_clusters, d), counts.reshape(m, n_clusters)
