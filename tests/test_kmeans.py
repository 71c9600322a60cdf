import numpy as np
import jax.numpy as jnp

from torchpq_tpu.clustering import KMeans, MultiKMeans, MinibatchKMeans


def _blobs(rng, n_clusters=8, n=512, d=16, scale=0.05):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    labels = rng.integers(0, n_clusters, size=n)
    x = centers[labels] + scale * rng.normal(size=(n, d)).astype(np.float32)
    return x.astype(np.float32), labels, centers


def test_kmeans_recovers_blobs(rng):
    x, true_labels, _ = _blobs(rng)
    km = KMeans(n_clusters=8, max_iter=50, tol=1e-6, init_mode="kmeans++",
                n_redo=3)
    labels = np.asarray(km.fit(jnp.asarray(x.T)))
    # cluster purity: each true cluster maps to (mostly) one predicted label
    purity = np.mean([
        (labels[true_labels == t] ==
         np.bincount(labels[true_labels == t]).argmax()).mean()
        for t in range(8)])
    assert purity > 0.95, purity
    assert km.centroids.shape == (16, 8)


def test_kmeans_predict_is_argmax(rng):
    x, _, _ = _blobs(rng)
    km = KMeans(n_clusters=8, max_iter=20)
    km.fit(jnp.asarray(x.T))
    q = rng.normal(size=(32, 16)).astype(np.float32)
    pred = np.asarray(km.predict(jnp.asarray(q.T)))
    cents = np.asarray(km.centroids).T  # [k, d]
    want = (-((q[:, None] - cents[None]) ** 2).sum(-1)).argmax(1)
    assert (pred == want).mean() > 0.99


def test_kmeans_topk(rng):
    x, _, _ = _blobs(rng)
    km = KMeans(n_clusters=8, max_iter=20)
    km.fit(jnp.asarray(x.T))
    q = rng.normal(size=(10, 16)).astype(np.float32)
    vals, idx = km.topk(jnp.asarray(q.T), k=3)
    assert vals.shape == (10, 3)
    assert np.all(np.diff(np.asarray(vals), axis=1) <= 1e-6)


def test_kmeans_distances(rng):
    x, _, _ = _blobs(rng)
    for dist in ["euclidean", "cosine", "inner", "manhattan"]:
        km = KMeans(n_clusters=4, max_iter=10, distance=dist)
        labels = km.fit(jnp.asarray(x.T))
        assert labels.shape == (512,)


def test_multikmeans(rng):
    m, d, n = 4, 8, 400
    x = rng.normal(size=(m, d, n)).astype(np.float32)
    km = MultiKMeans(n_clusters=16, max_iter=25)
    labels = km.fit(jnp.asarray(x))
    assert labels.shape == (m, n)
    assert km.centroids.shape == (m, d, 16)
    pred = km.predict(jnp.asarray(x))
    assert (np.asarray(pred) == np.asarray(labels)).mean() > 0.98


def test_minibatch_kmeans(rng):
    x, _, _ = _blobs(rng, n=2048)
    km = MinibatchKMeans(n_clusters=8)
    inertias = []
    for i in range(8):
        batch = x[i * 256:(i + 1) * 256]
        km.fit_minibatch(jnp.asarray(batch.T))
        inertias.append(km.inertia)
    assert inertias[-1] < inertias[0] * 1.5
    assert km.predict(jnp.asarray(x[:10].T)).shape == (10,)


def test_kmeanspp_init(rng):
    x, _, _ = _blobs(rng)
    km = KMeans(n_clusters=8, max_iter=10, init_mode="kmeans++")
    labels = km.fit(jnp.asarray(x.T))
    assert len(np.unique(np.asarray(labels))) >= 6


def test_multikmeans_topk_batched(rng):
    """MultiKMeans.topk (one batched program) matches per-problem topk."""
    from torchpq_tpu.clustering import MultiKMeans
    from torchpq_tpu.ops.max_sim import topk_sim
    m, dsub, n = 4, 8, 300
    x = rng.standard_normal((m, dsub, n)).astype(np.float32)
    km = MultiKMeans(n_clusters=16, max_iter=5)
    km.fit(jnp.asarray(x))
    vals, idx = km.topk(jnp.asarray(x), k=3)
    assert vals.shape == (m, n, 3) and idx.shape == (m, n, 3)
    for i in range(m):
        v1, i1 = topk_sim(jnp.asarray(x[i].T), km._centroids[i], 3,
                          "euclidean")
        np.testing.assert_allclose(np.asarray(vals[i]), np.asarray(v1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx[i]), np.asarray(i1))
