"""Transform -> index integration (the reference's intended composition:
PCA/OPQ preprocess feeding an IVFPQ index — torchpq/transform/PCA.py used
ahead of torchpq/index/*; OPQ was stubbed there, works here)."""

import numpy as np
import jax.numpy as jnp

from torchpq_tpu.index import IVFPQIndex, FlatIndex
from torchpq_tpu.transform import PCA, OPQ


def test_pca_into_ivfpq(rng):
    d, d_red, n = 64, 32, 3000
    x = rng.standard_normal((d, n)).astype(np.float32)
    # give the data a dominant subspace so PCA keeps most of the signal
    x[:d_red] *= 4.0
    pca = PCA(n_components=d_red)
    pca.train(jnp.asarray(x))
    z = pca.encode(jnp.asarray(x))
    assert z.shape == (d_red, n)

    index = IVFPQIndex(d_vector=d_red, n_subvectors=8, n_cells=16,
                       initial_size=512)
    index.train(z)
    ids = np.asarray(index.add(z))
    index.n_probe = 16
    zq = z[:, :32]
    _, got = index.search(zq, k=1)
    # self-query in the reduced space recovers the inserted row
    match = (np.asarray(got)[:, 0] == ids[:32]).mean()
    assert match >= 0.9


def test_opq_rotation_into_flat(rng):
    d, n = 32, 1500
    x = rng.standard_normal((d, n)).astype(np.float32)
    opq = OPQ(d_vector=d, n_subvectors=8, n_iter=3, pq_max_iter=5)
    opq.train(jnp.asarray(x[:, :1000]))
    z = opq.rotate(jnp.asarray(x))
    assert z.shape == (d, n)
    # the rotation is orthogonal: inner products (hence euclidean
    # neighborhoods) are preserved, so exact search through the transform
    # returns the same neighbors as in the original space
    flat = FlatIndex(d_vector=d, initial_size=2048)
    ids = np.asarray(flat.add(jnp.asarray(z)))
    _, got = flat.search(jnp.asarray(z[:, :64]), k=1)
    assert (np.asarray(got)[:, 0] == ids[:64]).all()
    gram_x = x[:, :8].T @ x[:, :8]
    zz = np.asarray(z)
    gram_z = zz[:, :8].T @ zz[:, :8]
    np.testing.assert_allclose(gram_z, gram_x, rtol=1e-3, atol=1e-2)
