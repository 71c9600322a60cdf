"""Fused similarity + argmax / top-k without materializing the [n, k] matrix.

Reference counterpart: torchpq/kernels/cuda/max_sim.cu (128x128 tiled fused
distance-matrix + argmax used by all KMeans assignment, SURVEY.md §2.2) and
topkbmm.cu (fused bmm + per-row top-128).

On TPU, XLA fuses the matmul epilogue (argmax over a tile) automatically when
we chunk the data axis so each [chunk, k] score tile stays small; `lax.map`
over chunks keeps peak memory at one tile while the MXU does the distance
matmul.

Implementation note: every jitted entry point here is a module-level function
(static args: distance/chunk/precision) — closures freshly defined per call
would defeat jit caching and pay a multi-second retrace+recompile each time.
"""

import functools

import jax
import jax.numpy as jnp

from .. import config
from .. import util
from ..metric import similarity, canonical_distance


def _chunk_rows(total_free_elems, inner):
    c = max(8, total_free_elems // max(inner, 1))
    return util.next_pow2(min(c, 65536))


def _scores_2d(data, centroids, distance, precision):
    return similarity(data, centroids, distance, precision=precision)


@functools.partial(jax.jit,
                   static_argnames=("distance", "chunk", "precision"))
def _max_sim_jit(data, centroids, *, distance, chunk, precision):
    n, d = data.shape

    def one(b):
        sim = _scores_2d(b, centroids, distance, precision)
        return jnp.max(sim, axis=-1), jnp.argmax(sim, axis=-1).astype(jnp.int32)

    if n <= chunk:
        return one(data)
    data_pad, _ = util.pad_rows(data, chunk)
    maxs, labels = jax.lax.map(one, data_pad.reshape(-1, chunk, d))
    return maxs.reshape(-1)[:n], labels.reshape(-1)[:n]


def max_sim(data, centroids, distance, precision=None, chunk=None):
    """(max similarity, argmax) over centroids for each row of data.

    data: [n, d], centroids: [k, d] -> (maxsims [n] f32, labels [n] i32).
    Reference: MaxSimCuda(dim=2) used by KMeans.get_labels
    (clustering/KMeans.py:313-319).
    """
    distance = canonical_distance(distance)
    if chunk is None:
        chunk = _chunk_rows(config.MAX_SIM_CHUNK_ELEMS, centroids.shape[0])
    return _max_sim_jit(data, centroids, distance=distance, chunk=chunk,
                        precision=precision)


@functools.partial(jax.jit,
                   static_argnames=("k_top", "distance", "chunk", "precision",
                                    "approx"))
def _topk_sim_jit(data, centroids, *, k_top, distance, chunk, precision,
                  approx=False):
    n, d = data.shape

    def one(b):
        sim = _scores_2d(b, centroids, distance, precision)
        if approx and k_top < sim.shape[-1]:
            return jax.lax.approx_max_k(sim, k_top)
        return jax.lax.top_k(sim, k_top)

    if n <= chunk:
        return one(data)
    data_pad, _ = util.pad_rows(data, chunk)
    vals, idx = jax.lax.map(one, data_pad.reshape(-1, chunk, d))
    return vals.reshape(-1, k_top)[:n], idx.reshape(-1, k_top)[:n]


def topk_sim(data, centroids, k_top, distance, precision=None, chunk=None,
             approx=False):
    """Per-row top-k over centroids (reference TopkBMMCuda / KMeans.topk,
    clustering/KMeans.py:449-480). approx uses the TPU-native approximate
    top-k (exact lax.top_k is a full sort)."""
    distance = canonical_distance(distance)
    k_top = min(int(k_top), centroids.shape[0])
    if chunk is None:
        chunk = _chunk_rows(config.MAX_SIM_CHUNK_ELEMS, centroids.shape[0])
    return _topk_sim_jit(data, centroids, k_top=k_top, distance=distance,
                         chunk=chunk, precision=precision, approx=approx)


def _scores_batched(b, centroids, distance, precision):
    """b: [m, c, d], centroids: [m, k, d] -> [m, c, k]."""
    if distance in ("inner", "cosine"):
        return jnp.einsum("mcd,mkd->mck", b, centroids,
                          precision=precision or config.TRAIN_PRECISION,
                          preferred_element_type=jnp.float32)
    if distance == "euclidean":
        ab = jnp.einsum("mcd,mkd->mck", b, centroids,
                        precision=precision or config.TRAIN_PRECISION,
                        preferred_element_type=jnp.float32)
        return (2.0 * ab
                - jnp.sum(jnp.square(b), axis=-1)[:, :, None]
                - jnp.sum(jnp.square(centroids), axis=-1)[:, None, :])
    if distance == "manhattan":
        return -jnp.sum(
            jnp.abs(b[:, :, None, :] - centroids[:, None, :, :]), axis=-1)
    raise AssertionError(distance)


@functools.partial(jax.jit,
                   static_argnames=("distance", "chunk", "precision"))
def _batched_max_sim_jit(data, centroids, *, distance, chunk, precision):
    m, n, d = data.shape

    def one(b):
        sim = _scores_batched(b, centroids, distance, precision)
        return jnp.max(sim, axis=-1), jnp.argmax(sim, axis=-1).astype(jnp.int32)

    if n <= chunk:
        return one(data)
    n_pad = util.round_up(n, chunk)
    data_pad = jnp.pad(data, ((0, 0), (0, n_pad - n), (0, 0)))
    blocks = data_pad.reshape(m, -1, chunk, d).swapaxes(0, 1)  # [nb, m, c, d]
    maxs, labels = jax.lax.map(one, blocks)  # [nb, m, c]
    maxs = maxs.swapaxes(0, 1).reshape(m, -1)[:, :n]
    labels = labels.swapaxes(0, 1).reshape(m, -1)[:, :n]
    return maxs, labels


@functools.partial(jax.jit,
                   static_argnames=("k_top", "distance", "chunk",
                                    "precision"))
def _batched_topk_sim_jit(data, centroids, *, k_top, distance, chunk,
                          precision):
    m, n, d = data.shape

    def one(b):
        sim = _scores_batched(b, centroids, distance, precision)
        return jax.lax.top_k(sim, k_top)

    if n <= chunk:
        return one(data)
    n_pad = util.round_up(n, chunk)
    data_pad = jnp.pad(data, ((0, 0), (0, n_pad - n), (0, 0)))
    blocks = data_pad.reshape(m, -1, chunk, d).swapaxes(0, 1)
    vals, idx = jax.lax.map(one, blocks)  # [nb, m, c, k_top]
    vals = vals.swapaxes(0, 1).reshape(m, -1, k_top)[:, :n]
    idx = idx.swapaxes(0, 1).reshape(m, -1, k_top)[:, :n]
    return vals, idx


def batched_topk_sim(data, centroids, k_top, distance, precision=None):
    """Per-problem top-k over centroids for MultiKMeans.topk — one jitted
    program over all m subproblems instead of m sequential topk_sim calls
    (each its own trace + dispatch). data: [m, n, d], centroids: [m, k, d]
    -> (vals [m, n, k_top], idx [m, n, k_top])."""
    distance = canonical_distance(distance)
    m, n, d = data.shape
    k = centroids.shape[1]
    k_top = min(int(k_top), k)
    chunk = _chunk_rows(config.MAX_SIM_CHUNK_ELEMS, max(m * k, 1))
    return _batched_topk_sim_jit(data, centroids, k_top=k_top,
                                 distance=distance, chunk=chunk,
                                 precision=precision)


def _scores_batched_dn(b_dn, centroids, distance, precision):
    """Feature-major variant: b_dn [m, d, c], centroids [m, k, d] ->
    [m, c, k]. Contracting d directly from the [m, d, c] layout never
    materializes a [.., c, d] array — the whole point of the dn path (a
    trailing dim of d_subvector=2 pays a 64x lane pad on TPU)."""
    if distance == "manhattan":
        # L1 needs the elementwise |b - c| expansion; transpose THIS CHUNK
        # only (the [m, c, d] tile is chunk-bounded, never the full data)
        return _scores_batched(jnp.swapaxes(b_dn, 1, 2), centroids,
                               distance, precision)
    ab = jnp.einsum("mdc,mkd->mck", b_dn, centroids,
                    precision=precision or config.TRAIN_PRECISION,
                    preferred_element_type=jnp.float32)
    if distance in ("inner", "cosine"):
        return ab
    if distance == "euclidean":
        return (2.0 * ab
                - jnp.sum(jnp.square(b_dn), axis=1)[:, :, None]
                - jnp.sum(jnp.square(centroids), axis=-1)[:, None, :])
    raise AssertionError(distance)


@functools.partial(jax.jit,
                   static_argnames=("distance", "chunk", "precision"))
def _batched_max_sim_dn_jit(data_dn, centroids, *, distance, chunk,
                            precision):
    m, d, n = data_dn.shape

    def one(b_dn):
        sim = _scores_batched_dn(b_dn, centroids, distance, precision)
        return jnp.max(sim, axis=-1), jnp.argmax(sim, axis=-1).astype(jnp.int32)

    if n <= chunk:
        return one(data_dn)
    n_pad = util.round_up(n, chunk)
    data_pad = jnp.pad(data_dn, ((0, 0), (0, 0), (0, n_pad - n)))
    blocks = data_pad.reshape(m, d, -1, chunk).transpose(2, 0, 1, 3)
    maxs, labels = jax.lax.map(one, blocks)  # [nb, m, c]
    maxs = maxs.transpose(1, 0, 2).reshape(m, -1)[:, :n]
    labels = labels.transpose(1, 0, 2).reshape(m, -1)[:, :n]
    return maxs, labels


def batched_max_sim(data, centroids, distance, precision=None, layout="nd"):
    """Batched (multi-problem) fused assignment for MultiKMeans.

    data: [m, n, d] (layout="nd") or [m, d, n] (layout="dn"; use for small
    d_subvector — a trailing dim below the 128-lane tile pays up to 64x
    HBM padding, so PQ training/encoding keeps data feature-major),
    centroids: [m, k, d] -> (maxsims [m, n], labels [m, n]).
    Reference: MaxSimCuda batched modes driven by MultiKMeans
    (clustering/MultiKMeans.py). Chunked over n.
    """
    distance = canonical_distance(distance)
    if layout == "dn":
        m, d, n = data.shape
    else:
        m, n, d = data.shape
    k = centroids.shape[1]
    chunk = _chunk_rows(config.MAX_SIM_CHUNK_ELEMS, max(m * k, 1))
    if layout == "dn":
        return _batched_max_sim_dn_jit(data, centroids, distance=distance,
                                       chunk=chunk, precision=precision)
    return _batched_max_sim_jit(data, centroids, distance=distance,
                                chunk=chunk, precision=precision)
