"""Interpret-mode parity: the Pallas fused block-scan must reproduce the XLA
exact scan bit-for-bit-ish (same selection, same packed outputs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.index.ivfpq import _coarse_probe
from torchpq_tpu.ops import adc


@pytest.mark.parametrize("distance", ["euclidean", "inner"])
def test_pallas_scan_matches_xla(rng, distance):
    d, m, n_cells, n = 32, 8, 8, 700
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       distance=distance, scan_cache_dtype="float32",
                       initial_size=64)
    index.train(jnp.asarray(x.T))
    index.add(jnp.asarray(x.T))

    nq, n_probe, k = 13, 4, 6
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=n_probe, use_smart=False, precision=None)

    args = (q, cells, mask, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity)
    kw = dict(k=k, distance=distance, s_max=index.max_cell_capacity,
              n_cells=n_cells, approx=False)
    v_x, a_x = adc.scan_cell_major(*args, impl="xla", **kw)
    v_p, a_p = adc.scan_cell_major(*args, impl="pallas", interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a_p), np.asarray(a_x))
