import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import FlatIndex


def _np_search(x, q, distance, k):
    if distance == "euclidean":
        s = -((q[:, None] - x[None]) ** 2).sum(-1)
    elif distance == "inner":
        s = q @ x.T
    elif distance == "cosine":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        s = qn @ xn.T
    else:
        s = -np.abs(q[:, None] - x[None]).sum(-1)
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


@pytest.mark.parametrize("distance",
                         ["euclidean", "inner", "cosine", "manhattan"])
def test_flat_index_exact(rng, distance):
    d, n, nq, k = 24, 300, 17, 5
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    index = FlatIndex(d_vector=d, distance=distance, initial_size=512)
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    vals, got_ids = index.search(jnp.asarray(q.T), k=k)
    want_vals, want_idx = _np_search(x, q, distance, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals,
                               rtol=1e-3, atol=1e-3)
    # ids map through the container's id assignment
    np.testing.assert_array_equal(np.asarray(got_ids), ids[want_idx])


def test_flat_index_remove_then_search(rng):
    d, n = 8, 50
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = FlatIndex(d_vector=d, initial_size=64)
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    # remove the exact nearest neighbor of query = x[7]
    index.remove(ids=ids[7:8])
    vals, got = index.search(jnp.asarray(x[7:8].T), k=1)
    assert int(np.asarray(got)[0, 0]) != ids[7]


def test_flat_index_k_larger_than_n(rng):
    d = 8
    x = rng.normal(size=(3, d)).astype(np.float32)
    index = FlatIndex(d_vector=d, initial_size=8)
    index.add(jnp.asarray(x.T))
    vals, got = index.search(jnp.asarray(x.T), k=10)
    assert vals.shape == (3, 10)
    assert np.all(np.asarray(got)[:, 3:] == -1)
