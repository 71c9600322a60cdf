import numpy as np
import jax.numpy as jnp

from torchpq_tpu import metric
from torchpq_tpu import config
import jax

config.SEARCH_PRECISION = jax.lax.Precision.HIGHEST


def _np_scores(a, b, distance):
    if distance == "inner":
        return a @ b.T
    if distance == "cosine":
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        return an @ bn.T
    if distance == "euclidean":
        return -((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    if distance == "manhattan":
        return -np.abs(a[:, None, :] - b[None, :, :]).sum(-1)


def test_similarity_all_distances(rng):
    a = rng.normal(size=(33, 24)).astype(np.float32)
    b = rng.normal(size=(57, 24)).astype(np.float32)
    for dist in ["euclidean", "cosine", "inner", "manhattan"]:
        got = np.asarray(metric.similarity(jnp.asarray(a), jnp.asarray(b), dist))
        want = _np_scores(a, b, dist)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_aliases():
    assert metric.canonical_distance("l2") == "euclidean"
    assert metric.canonical_distance("angular") == "cosine"
    assert metric.canonical_distance("dot") == "inner"
    assert metric.canonical_distance("l1") == "manhattan"


def test_manhattan_chunked(rng):
    a = rng.normal(size=(100, 16)).astype(np.float32)
    b = rng.normal(size=(40, 16)).astype(np.float32)
    got = np.asarray(metric.negative_manhattan_distance(
        jnp.asarray(a), jnp.asarray(b), chunk=16))
    np.testing.assert_allclose(got, _np_scores(a, b, "manhattan"),
                               rtol=1e-4, atol=1e-3)
