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


def _scan_setup(rng, n, d=32, m=8, n_cells=8, distance="euclidean"):
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       distance=distance, scan_cache_dtype="float32",
                       initial_size=64)
    index.train(jnp.asarray(x.T))
    index.add(jnp.asarray(x.T))
    return index


def test_pallas_approx_scan_recall(rng):
    """Approx kernel (strided group reduce + pack32 wire format) must agree
    with the exact scan on nearly all winners; s_eff >= 256 so the group
    reduction actually engages."""
    index = _scan_setup(rng, n=3000)
    assert index.max_cell_capacity >= 256, "test needs the group-reduce path"
    nq, n_probe, k = 32, 4, 8
    q = jnp.asarray(rng.normal(size=(nq, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=n_probe, use_smart=False, precision=None)
    args = (q, cells, mask, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity)
    kw = dict(k=k, distance="euclidean", s_max=index.max_cell_capacity,
              n_cells=8)
    v_x, a_x = adc.scan_cell_major(*args, approx=False, impl="xla", **kw)
    v_p, a_p = adc.scan_cell_major(*args, approx=True, impl="pallas",
                                   interpret=True, **kw)
    a_x, a_p = np.asarray(a_x), np.asarray(a_p)
    recall = np.mean([len(set(a_p[i]) & set(a_x[i])) / k
                      for i in range(nq)])
    assert recall >= 0.9, f"approx pallas recall {recall}"
    # values of agreeing addresses match up to pack32 truncation
    v_p, v_x = np.asarray(v_p), np.asarray(v_x)
    for i in range(nq):
        common = set(a_p[i]) & set(a_x[i]) - {-1}
        for a in common:
            vx = v_x[i][a_x[i] == a][0]
            vp = v_p[i][a_p[i] == a][0]
            assert abs(vp - vx) <= max(1e-2, 2e-3 * abs(vx)), (i, a, vp, vx)


@pytest.mark.parametrize("approx", [False, True])
def test_pallas_int8_scan_matches_xla(rng, approx):
    """int8-cache kernel mode: the window DMA moves 1 B/dim and the MXU
    runs int8 x int8 -> int32; selection must match the XLA int8 branch
    (identical integer matmul + identical dequant op order)."""
    d, m, n_cells, n = 32, 8, 8, 3000
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       distance="euclidean", scan_cache_dtype="int8",
                       initial_size=64)
    index.train(jnp.asarray(x.T))
    index.add(jnp.asarray(x.T))
    assert index.aux("decoded").dtype == jnp.int8

    nq, n_probe, k = 16, 4, 8
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=n_probe, use_smart=False, precision=None)
    args = (q, cells, mask, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity)
    kw = dict(k=k, distance="euclidean", s_max=index.max_cell_capacity,
              n_cells=n_cells, approx=approx,
              scales=index.aux("scale")[:, 0])
    v_x, a_x = adc.scan_cell_major(*args, impl="xla", **kw)
    v_p, a_p = adc.scan_cell_major(*args, impl="pallas", interpret=True, **kw)
    assert adc.LAST_GATE["impl"] == "pallas" and \
        adc.LAST_GATE["cache"] == "int8"
    a_x, a_p = np.asarray(a_x), np.asarray(a_p)
    v_x, v_p = np.asarray(v_x), np.asarray(v_p)
    if approx:
        recall = np.mean([len(set(a_p[i]) & set(a_x[i])) / k
                          for i in range(nq)])
        assert recall >= 0.9, f"int8 approx pallas vs xla recall {recall}"
    else:
        np.testing.assert_array_equal(a_p, a_x)
        np.testing.assert_allclose(v_p, v_x, rtol=1e-5, atol=1e-5)


def test_k_pair_cap_large_k(rng):
    """Approx mode caps the per-pair candidate count for large k; recall
    against the exact scan must survive the cap."""
    index = _scan_setup(rng, n=3000)
    nq, n_probe, k = 16, 8, 64
    q = jnp.asarray(rng.normal(size=(nq, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=n_probe, use_smart=False, precision=None)
    args = (q, cells, mask, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity)
    kw = dict(k=k, distance="euclidean", s_max=index.max_cell_capacity,
              n_cells=8)
    v_x, a_x = adc.scan_cell_major(*args, approx=False, impl="xla", **kw)
    # default policy caps k_pair at max(16, 4*ceil(64/8)) = 32 < k
    v_c, a_c = adc.scan_cell_major(*args, approx=True, impl="xla", **kw)
    a_x, a_c = np.asarray(a_x), np.asarray(a_c)
    recall = np.mean([len(set(a_c[i]) & set(a_x[i])) / k
                      for i in range(nq)])
    assert recall >= 0.9, f"k_pair-capped recall {recall}"


@pytest.mark.parametrize("cache", ["float32", "int8"])
def test_pallas_qtable_mode_matches_streamed(rng, cache, monkeypatch):
    """resident-qtable mode (in-kernel one-hot query fetch — the d=960
    glue fix) must produce the same outputs as the streamed-tile mode:
    one-hot selection is exact in every dtype."""
    from torchpq_tpu.ops import pallas_scan
    d, m, n_cells, n = 32, 8, 8, 2000
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       scan_cache_dtype=cache, initial_size=64)
    index.train(jnp.asarray(x.T))
    index.add(jnp.asarray(x.T))
    nq, n_probe, k = 16, 4, 6
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=n_probe, use_smart=False, precision=None)
    scales = index.aux("scale")[:, 0] if cache == "int8" else None
    args = (q, cells, mask, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity)
    kw = dict(distance="euclidean", s_max=index.max_cell_capacity,
              n_cells=n_cells, approx=False, impl="pallas", interpret=True,
              scales=scales)
    v_t, a_t = adc.scan_cell_major(*args, k=k, **kw)
    assert adc.LAST_GATE["qtable"] is True
    monkeypatch.setattr(pallas_scan, "QTABLE_VMEM_BYTES", 0)
    v_s, a_s = adc.scan_cell_major(*args, k=k + 1, **kw)  # fresh trace
    assert adc.LAST_GATE["qtable"] is False
    np.testing.assert_array_equal(np.asarray(a_t), np.asarray(a_s)[:, :k])
    np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_s)[:, :k],
                               rtol=1e-6)
