"""similarity_at_address/_id must agree with search()'s scoring under
every cache dtype and metric (review regression: int8 caches were scored
without dequantization, cosine queries without normalization)."""

import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import IVFPQIndex


def _build(rng, distance, cache=None):
    d, n = 32, 1000
    x = rng.standard_normal((d, n)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=8,
                       initial_size=256, distance=distance,
                       scan_cache_dtype=cache)
    index.train(jnp.asarray(x[:, :500]))
    ids = np.asarray(index.add(jnp.asarray(x)))
    return index, x, ids


@pytest.mark.parametrize("distance", ["euclidean", "cosine", "inner"])
def test_similarity_matches_search_values(rng, distance):
    index, x, ids = _build(rng, distance)
    index.n_probe = 8
    q = jnp.asarray(x[:, :20])
    vals, got = index.search(q, k=3)
    sims = np.asarray(index.similarity_at_id(q, np.asarray(got)[:, 0]))
    # diagonal of the rescoring matrix = top-1 similarity from search
    # (tolerance: search scores on the bf16 cache in bf16; rescoring casts
    # to f32 — euclidean's 2ab - |y|^2 - |q|^2 cancellation amplifies the
    # bf16 rounding for near neighbors)
    diag = np.diag(sims)
    np.testing.assert_allclose(diag, np.asarray(vals)[:, 0],
                               rtol=0.08, atol=0.08)


def test_similarity_int8_cache_dequantizes(rng):
    d, n = 32, 1000
    x = rng.standard_normal((d, n)).astype(np.float32)

    def build(cache):
        index = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=8,
                           initial_size=256, scan_cache_dtype=cache, seed=0)
        index.train(jnp.asarray(x[:, :500]))
        index.add(jnp.asarray(x))
        return index

    # same data + seed -> same codebooks; int8 rescoring must approximate
    # the bf16 rescoring, not return raw quantized magnitudes
    i8, bf = build("int8"), build(None)
    q = jnp.asarray(x[:, :10])
    addr = np.arange(20)
    s8 = np.asarray(i8.similarity_at_address(q, addr))
    sb = np.asarray(bf.similarity_at_address(q, addr))
    live = np.isfinite(sb) & np.isfinite(s8)
    assert live.any()
    np.testing.assert_allclose(s8[live], sb[live], rtol=0.05, atol=0.5)
