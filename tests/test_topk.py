import numpy as np
import jax.numpy as jnp

from torchpq_tpu.fn import topk


def test_topk_matches_numpy(rng):
    x = rng.normal(size=(17, 300)).astype(np.float32)
    for k in [1, 7, 32, 300]:
        vals, idx = topk(jnp.asarray(x), k)
        want = -np.sort(-x, axis=1)[:, :k]
        np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-6)
        np.testing.assert_allclose(
            np.take_along_axis(x, np.asarray(idx), axis=1), want, rtol=1e-6)


def test_topk_dim0(rng):
    x = rng.normal(size=(50, 9)).astype(np.float32)
    vals, idx = topk(jnp.asarray(x), 5, dim=0)
    want = -np.sort(-x, axis=0)[:5]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-6)


def test_topk_pads_beyond_n(rng):
    x = rng.normal(size=(4, 6)).astype(np.float32)
    vals, idx = topk(jnp.asarray(x), 10)
    assert vals.shape == (4, 10)
    assert np.all(np.isneginf(np.asarray(vals)[:, 6:]))
