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


@functools.partial(jax.jit, static_argnames=("n_clusters", "chunk"))
def batched_compute_centroids_dn(data_dn, labels, n_clusters, *, chunk):
    """Feature-major variant: data_dn [m, d, n], labels [m, n] ->
    (sums [m, n_clusters, d], counts [m, n_clusters]).

    Per-cluster sums as chunked one-hot MXU matmuls — sums[m, d, k] +=
    data_chunk[m, d, c] @ onehot(labels_chunk)[m, c, k] — so no [.., n, d]
    array ever exists (the nd variant's segment_sum needs row-major rows;
    at d_subvector=2 that layout pays a 64x lane pad — ivfpq.py's 100M
    demo OOMed exactly there)."""
    m, d, n = data_dn.shape
    n_pad = ((n + chunk - 1) // chunk) * chunk
    data_pad = jnp.pad(data_dn, ((0, 0), (0, 0), (0, n_pad - n)))
    # padded tail: labels = n_clusters (an extra bin the onehot drops)
    lab_pad = jnp.pad(labels, ((0, 0), (0, n_pad - n)),
                      constant_values=n_clusters)
    blocks = data_pad.reshape(m, d, -1, chunk).transpose(2, 0, 1, 3)
    lab_blocks = lab_pad.reshape(m, -1, chunk).swapaxes(0, 1)

    def step(carry, args):
        sums, counts = carry
        b_dn, lab = args  # [m, d, c], [m, c]
        oh = jax.nn.one_hot(lab, n_clusters, dtype=jnp.float32)  # [m, c, k]
        sums = sums + jnp.einsum("mdc,mck->mdk", b_dn, oh,
                                 preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(oh, axis=1)
        return (sums, counts), None

    init = (jnp.zeros((m, d, n_clusters), jnp.float32),
            jnp.zeros((m, n_clusters), jnp.float32))
    (sums, counts), _ = jax.lax.scan(step, init, (blocks, lab_blocks))
    return jnp.swapaxes(sums, 1, 2), counts
