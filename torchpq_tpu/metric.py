"""Similarity metrics (reference counterpart: torchpq/metric.py).

Convention (reference README.md:78-81): every score is a *similarity* — larger
is better. Euclidean -> negative squared L2, manhattan -> negative L1.

All functions here take row-major [n, d] arrays (the public classes transpose
the reference's [d, n] layout at the boundary) and return [n_a, n_b] score
matrices. Pairwise matmuls ride the MXU; the manhattan metric has no matmul
form, so it is computed in lane-friendly chunks on the VPU (the reference
solves the same problem with a dedicated fused kernel family,
torchpq/kernels/cuda/bmm_helpers.cu:25-74 `l1`/`negative_l1` epilogues).
"""

import functools

import jax
import jax.numpy as jnp

from . import config
from . import util

CANONICAL = {
    "euclidean": "euclidean", "l2": "euclidean",
    "cosine": "cosine", "angular": "cosine",
    "inner": "inner", "dot": "inner", "ip": "inner",
    "manhattan": "manhattan", "l1": "manhattan",
}


def canonical_distance(name):
    key = str(name).lower()
    assert key in CANONICAL, f"unknown distance {name!r}"
    return CANONICAL[key]


def inner_similarity(a, b, precision=None):
    """<a_i, b_j> for all pairs. a: [na, d], b: [nb, d] -> [na, nb]."""
    precision = config.SEARCH_PRECISION if precision is None else precision
    return jnp.matmul(a, b.T, precision=precision,
                      preferred_element_type=jnp.float32)


def cosine_similarity(a, b, precision=None):
    """Cosine similarity (reference torchpq/metric.py:4-29)."""
    return inner_similarity(util.normalize(a), util.normalize(b),
                            precision=precision)


def negative_squared_l2_distance(a, b, precision=None, b_sq=None):
    """-||a_i - b_j||^2 expanded as 2<a,b> - ||a||^2 - ||b||^2.

    Same cuBLAS-style expansion as the reference (torchpq/metric.py:31-99);
    `b_sq` lets callers pass precomputed ||b||^2 (the decoded-cache norm trick
    in the IVFPQ scan path).
    """
    ab = inner_similarity(a, b, precision=precision)
    a_sq = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
    if b_sq is None:
        b_sq = jnp.sum(jnp.square(b), axis=-1)
    return 2.0 * ab - a_sq - b_sq[None, :]


def negative_manhattan_distance(a, b, chunk=None):
    """-sum_k |a_ik - b_jk|; chunked over rows of `a` to bound the [ca, nb, d]
    broadcast intermediate."""
    na, d = a.shape
    nb = b.shape[0]
    if chunk is None:
        chunk = max(1, config.MAX_SIM_CHUNK_ELEMS // max(nb * d, 1))

    def one_chunk(a_chunk):
        return -jnp.sum(jnp.abs(a_chunk[:, None, :] - b[None, :, :]), axis=-1)

    if na <= chunk:
        return one_chunk(a)
    a_pad, n_valid = util.pad_rows(a, chunk)
    blocks = a_pad.reshape(-1, chunk, d)
    out = jax.lax.map(one_chunk, blocks).reshape(-1, nb)
    return out[:na]


def similarity(a, b, distance, precision=None, b_sq=None):
    """Dispatch by canonical distance name; [na, d] x [nb, d] -> [na, nb]."""
    distance = canonical_distance(distance)
    if distance == "euclidean":
        return negative_squared_l2_distance(a, b, precision=precision, b_sq=b_sq)
    if distance == "cosine":
        return cosine_similarity(a, b, precision=precision)
    if distance == "inner":
        return inner_similarity(a, b, precision=precision)
    if distance == "manhattan":
        return negative_manhattan_distance(a, b)
    raise AssertionError(distance)


def preprocess_query(q, distance):
    """Queries are L2-normalized for cosine (reference IVFPQIndex.py:474-475)."""
    if canonical_distance(distance) == "cosine":
        return util.normalize(q)
    return q
