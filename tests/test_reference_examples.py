"""The reference README's usage examples, translated 1:1 (torch tensors ->
jnp arrays, device args dropped). A reference user switching over should be
able to run their code with these mechanical substitutions
(reference README.md:30-120)."""

import numpy as np
import jax.numpy as jnp

import torchpq_tpu as torchpq


def test_readme_ivfpq_flow(rng, tmp_path):
    d_vector, n_data = 32, 2000
    index = torchpq.index.IVFPQIndex(
        d_vector=d_vector, n_subvectors=8, n_cells=16, initial_size=128,
        distance="euclidean", scan_cache_dtype="float32")

    trainset = jnp.asarray(rng.normal(size=(d_vector, n_data)),
                           dtype=jnp.float32)
    index.train(trainset)

    # adding new vectors (ids optional)
    baseset = jnp.asarray(rng.normal(size=(d_vector, n_data)),
                          dtype=jnp.float32)
    ids = jnp.arange(n_data)
    index.add(baseset, ids=ids)

    # topk search
    index.n_probe = 8
    queryset = baseset[:, :100]
    topk_values, topk_ids = index.search(queryset, k=10)
    assert topk_values.shape == (100, 10)
    hit = (np.asarray(topk_ids) == np.arange(100)[:, None]).any(1).mean()
    assert hit > 0.9

    # removing vectors ("ignores ids that don't exist")
    index.remove(ids=jnp.asarray(np.r_[np.arange(50), [999999]]))
    assert index.n_items == n_data - 50

    # encode / decode as a vector codec
    code = index.encode(queryset)
    reconstruction = index.decode(code)
    assert reconstruction.shape == queryset.shape

    # save / load (state_dict round trip, like torch.save(state_dict()))
    state = index.state_dict()
    # capacity accounting without device->host transfer matches the
    # materialized state byte-for-byte (used by scripts/demo_100m.py)
    assert index.state_nbytes() == sum(
        v.nbytes for v in state.values() if hasattr(v, "nbytes"))
    index2 = torchpq.index.IVFPQIndex(
        d_vector=d_vector, n_subvectors=8, n_cells=16, initial_size=128,
        scan_cache_dtype="float32")
    index2.load_state_dict(state)
    index2.n_probe = 8
    v2, i2 = index2.search(queryset, k=10)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(
        index.search(queryset, k=10)[1]))


def test_readme_kmeans(rng):
    from torchpq_tpu.clustering import KMeans
    kmeans = KMeans(n_clusters=16, distance="euclidean")
    x = jnp.asarray(rng.normal(size=(24, 1000)), dtype=jnp.float32)
    labels = kmeans.fit(x)
    assert labels.shape == (1000,)
    labels2 = kmeans.predict(x)
    assert (np.asarray(labels2) == np.asarray(labels)).mean() > 0.98


def test_readme_topk_singleton(rng):
    x = jnp.asarray(rng.normal(size=(7, 50)), dtype=jnp.float32)
    values, indices = torchpq.topk(x, k=5, dim=-1)
    assert values.shape == (7, 5)


def test_readme_distance_value_semantics(rng):
    """README: euclidean -> negative squared L2 values; inner -> dot."""
    d, n = 16, 400
    x = rng.normal(size=(n, d)).astype(np.float32)
    for dist in ("euclidean", "inner"):
        index = torchpq.index.IVFPQIndex(
            d_vector=d, n_subvectors=4, n_cells=4, initial_size=256,
            distance=dist, scan_cache_dtype="float32")
        index.train(jnp.asarray(x.T))
        index.add(jnp.asarray(x.T))
        index.n_probe = 4
        index.use_smart_probing = False
        v, ids = index.search(jnp.asarray(x[:5].T), k=1)
        decoded = np.asarray(index.aux("decoded"))
        addr = np.asarray(index.get_address_by_id(ids[:, 0]))
        y = decoded[addr]
        if dist == "euclidean":
            want = -((x[:5] - y) ** 2).sum(1)
        else:
            want = (x[:5] * y).sum(1)
        np.testing.assert_allclose(np.asarray(v)[:, 0], want,
                                   rtol=1e-3, atol=1e-3)
