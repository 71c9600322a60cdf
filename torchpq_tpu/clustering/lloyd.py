"""Functional core of the k-means family.

Reference counterpart: the fit loops of torchpq/clustering/KMeans.py:399-438
and MultiKMeans.py:415-453 (assignment = fused MaxSim kernel, update =
compute_centroids kernel, convergence by centroid-shift tol, n_redo restarts
picking minimum inertia).

Everything here operates on a batch of `m` independent problems at once
(`m == 1` for plain KMeans, `m == n_subvectors` for PQ codebook training):
data [m, n, d] f32, centroids [m, k, d] f32. The whole fit runs inside one
jit with a `lax.while_loop`; assignment chunks over n via `lax.map` so the
[chunk, k] score tile bounds memory (the reference's MaxSim kernel solves the
same problem by never materializing [n, k]).
"""

import functools

import jax
import jax.numpy as jnp

from .. import config, util
from ..metric import canonical_distance
from ..ops.max_sim import batched_max_sim
from ..ops.segment_ops import (batched_compute_centroids,
                               batched_compute_centroids_dn)


def _init_random(data, key, n_clusters):
    """Pick k distinct data points per problem (reference
    KMeans.initialize_centroids "random", clustering/KMeans.py:264-283)."""
    m, n, d = data.shape
    keys = jax.random.split(key, m)

    def one(args):
        k_, x = args
        idx = jax.random.choice(k_, n, (n_clusters,), replace=n < n_clusters)
        return x[idx]

    return jax.lax.map(one, (keys, data))


def _init_kmeanspp(data, key, n_clusters, distance):
    """k-means++ seeding (reference KMeans.kmeanspp,
    clustering/KMeans.py:230-262: incremental max-sim loop). Sampling uses the
    Gumbel-max trick on log D^2 so the whole loop stays inside jit."""
    m, n, d = data.shape
    keys = jax.random.split(key, m)

    def one(args):
        k_, x = args  # x: [n, d]
        k0, k_ = jax.random.split(k_)
        first = x[jax.random.randint(k0, (), 0, n)]
        cents = jnp.zeros((n_clusters, d), x.dtype).at[0].set(first)

        def dist_to(c):
            if canonical_distance(distance) == "manhattan":
                return jnp.sum(jnp.abs(x - c[None, :]), axis=-1)
            return jnp.sum(jnp.square(x - c[None, :]), axis=-1)

        def body(i, carry):
            cents, best_d, kk = carry
            kk, ks = jax.random.split(kk)
            logp = jnp.log(jnp.maximum(best_d, 1e-30))
            g = jax.random.gumbel(ks, (n,))
            idx = jnp.argmax(logp + g)
            c = x[idx]
            cents = cents.at[i].set(c)
            best_d = jnp.minimum(best_d, dist_to(c))
            return cents, best_d, kk

        cents, _, _ = jax.lax.fori_loop(
            1, n_clusters, body, (cents, dist_to(first), k_))
        return cents

    return jax.lax.map(one, (keys, data))


def _init_random_dn(data_dn, key, n_clusters):
    """Feature-major _init_random: data_dn [m, d, n] -> [m, k, d]."""
    m, d, n = data_dn.shape
    keys = jax.random.split(key, m)

    def one(args):
        k_, x_dn = args
        idx = jax.random.choice(k_, n, (n_clusters,), replace=n < n_clusters)
        return x_dn[:, idx].T

    return jax.lax.map(one, (keys, data_dn))


def _init_kmeanspp_dn(data_dn, key, n_clusters, distance):
    """Feature-major k-means++ (same Gumbel-max in-jit recipe)."""
    m, d, n = data_dn.shape
    keys = jax.random.split(key, m)

    def one(args):
        k_, x_dn = args  # [d, n]
        k0, k_ = jax.random.split(k_)
        first = x_dn[:, jax.random.randint(k0, (), 0, n)]
        cents = jnp.zeros((n_clusters, d), x_dn.dtype).at[0].set(first)

        def dist_to(c):
            if canonical_distance(distance) == "manhattan":
                return jnp.sum(jnp.abs(x_dn - c[:, None]), axis=0)
            return jnp.sum(jnp.square(x_dn - c[:, None]), axis=0)

        def body(i, carry):
            cents, best_d, kk = carry
            kk, ks = jax.random.split(kk)
            logp = jnp.log(jnp.maximum(best_d, 1e-30))
            g = jax.random.gumbel(ks, (n,))
            idx = jnp.argmax(logp + g)
            c = x_dn[:, idx]
            cents = cents.at[i].set(c)
            best_d = jnp.minimum(best_d, dist_to(c))
            return cents, best_d, kk

        cents, _, _ = jax.lax.fori_loop(
            1, n_clusters, body, (cents, dist_to(first), k_))
        return cents

    return jax.lax.map(one, (keys, data_dn))


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "max_iter", "distance", "init_mode",
                     "layout"))
def lloyd_fit(data, key, *, n_clusters, max_iter, tol, distance, init_mode,
              init_centroids=None, layout="nd"):
    """One full Lloyd run per problem. Returns (centroids [m, k, d],
    labels [m, n], inertia [m], n_iters).

    layout="dn" takes data as [m, d, n] and keeps it feature-major through
    assignment AND the centroid update — a trailing d below the 128-lane
    TPU tile pays up to 64x HBM padding on a [m, n, d] array (PQ training
    at d_subvector=2 turns 512 MB into 32 GB), so small-d problems must
    never materialize that layout."""
    distance = canonical_distance(distance)
    dn = layout == "dn"
    if dn:
        m, d, n = data.shape
    else:
        m, n, d = data.shape
    if distance == "cosine":
        data = util.normalize(data, axis=1 if dn else -1)

    if init_centroids is not None:
        cents = init_centroids
    elif init_mode == "kmeans++":
        cents = (_init_kmeanspp_dn if dn else _init_kmeanspp)(
            data, key, n_clusters, distance)
    else:
        cents = (_init_random_dn if dn else _init_random)(
            data, key, n_clusters)
    if distance == "cosine":
        cents = util.normalize(cents)

    cc_chunk = util.next_pow2(min(max(
        8, config.MAX_SIM_CHUNK_ELEMS // max(m * n_clusters, 1)), 65536))

    def assign(c):
        return batched_max_sim(data, c, distance,
                               layout="dn" if dn else "nd")

    def update(labels):
        if dn:
            return batched_compute_centroids_dn(data, labels, n_clusters,
                                                chunk=cc_chunk)
        return batched_compute_centroids(data, labels, n_clusters)

    def cond(carry):
        _, err, i = carry
        return jnp.logical_and(i < max_iter, err > tol)

    def body(carry):
        c, _, i = carry
        _, labels = assign(c)
        sums, counts = update(labels)
        new_c = jnp.where((counts > 0)[..., None], sums /
                          jnp.maximum(counts, 1.0)[..., None], c)
        if distance == "cosine":
            new_c = util.normalize(new_c)
        # reference KMeans.calculate_error (clustering/KMeans.py:143-147)
        err = jnp.sum(jnp.square(new_c - c))
        return new_c, err, i + 1

    cents, err, iters = jax.lax.while_loop(
        cond, body, (cents, jnp.float32(jnp.inf), jnp.int32(0)))
    maxs, labels = assign(cents)
    # reference KMeans.calculate_inertia (clustering/KMeans.py:149-151)
    inertia = -jnp.mean(maxs, axis=-1)
    return cents, labels, inertia, iters


def fit_redo(data, key, *, n_clusters, n_redo, max_iter, tol, distance,
             init_mode, init_centroids=None, layout="nd"):
    """n_redo restarts, keeping the lowest-inertia run per problem
    (reference clustering/KMeans.py:399-438). Explicit init_centroids make
    Lloyd deterministic, so restarts would be bit-identical — run once."""
    if init_centroids is not None:
        n_redo = 1
    best = None
    for r in range(max(n_redo, 1)):
        out = lloyd_fit(
            data, jax.random.fold_in(key, r), n_clusters=n_clusters,
            max_iter=max_iter, tol=tol, distance=distance,
            init_mode=init_mode, init_centroids=init_centroids,
            layout=layout)
        if best is None:
            best = out
        else:
            c0, l0, i0, _ = best
            c1, l1, i1, it = out
            take = i1 < i0  # [m]
            best = (jnp.where(take[:, None, None], c1, c0),
                    jnp.where(take[:, None], l1, l0),
                    jnp.minimum(i1, i0), it)
    return best
