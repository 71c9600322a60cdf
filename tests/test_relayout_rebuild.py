"""Relayout must rebuild the derived scan caches from the codes.

Growth re-layouts (CellContainer._relayout) drop the decoded/norm(/scale)
aux stores before moving storage and recompute them afterwards via the
index's rebuilder (IVFPQIndex._rebuild_scan_cache) — gathering them like
primary state would transiently hold two capacity-sized decoded caches
(the GIST1M-scale OOM). These tests force expansions and check the
rebuilt caches equal a direct reconstruction from the canonical codes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import IVFPQIndex, IVFPQRIndex


def _check_decoded_cache(index, residual, rerank=False):
    """aux('decoded')[addr] must equal the PQ reconstruction of the codes
    at addr (+ the owning cell's coarse centroid under residual PQ; + the
    rerank-code decode for IVFPQR, whose cache rows are the full two-stage
    reconstruction)."""
    live = np.flatnonzero(~np.asarray(index._is_empty))
    assert len(live) == index.n_items
    # storage_rows is pack-aware (cache tiers store lane-packed rows too
    # since r5 — the unpacked view is an accessor, not the layout)
    codes = np.asarray(index.storage_rows(jnp.asarray(live)))
    dec = np.asarray(index.pq_codec.decode_nd(jnp.asarray(codes)))
    if residual:
        starts = np.asarray(index._cell_start)
        cell = np.searchsorted(starts, live, side="right") - 1
        vq_rows = np.asarray(index.vq_codec.kmeans._centroids[0])
        dec = dec + vq_rows[cell]
    if rerank:
        rcodes = np.asarray(index.aux("rerank_codes"))[live]
        dec = dec + np.asarray(
            index.rerank_codec.decode_nd(jnp.asarray(rcodes)))
    cache = np.asarray(index.aux("decoded"))[live].astype(np.float32)
    if index._int8_cache:
        cache = cache * np.asarray(index.aux("scale"))[live]
    np.testing.assert_allclose(cache, dec, rtol=0.02, atol=0.02)
    nrm = np.asarray(index.aux("norm"))[live, 0]
    np.testing.assert_allclose(nrm, (dec ** 2).sum(1), rtol=0.02, atol=0.05)


@pytest.mark.parametrize("residual,cache", [
    (False, None), (True, None), (False, "int8")])
def test_expand_rebuilds_scan_cache(rng, residual, cache):
    d, n = 32, 1200
    x = rng.standard_normal((d, n)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=8,
                       initial_size=16, pq_use_residual=residual,
                       scan_cache_dtype=cache)
    index.train(jnp.asarray(x[:, :600]))
    cap0 = index.capacity
    ids = np.asarray(index.add(jnp.asarray(x)))
    assert index.capacity > cap0, "test must exercise a relayout"
    _check_decoded_cache(index, residual)
    # search still agrees with its own rescoring oracle end to end
    index.n_probe = 8
    vals, got = index.search(jnp.asarray(x[:, :16]), k=1)
    assert np.asarray(got)[:, 0].tolist() == ids[:16].tolist()


def test_expand_preserves_rerank_codes(rng):
    """A relayout must preserve the rerank-codes row store and rebuild the
    IVFPQR decoded cache as the FULL two-stage reconstruction (the refined
    cache IS the rerank mechanism for cached configs — index/ivfpqr.py)."""
    d, n = 32, 1000
    x = rng.standard_normal((d, n)).astype(np.float32)
    index = IVFPQRIndex(d_vector=d, n_subvectors=8, n_subvectors_rerank=16,
                        n_cells=8, initial_size=16)
    index.train(jnp.asarray(x[:, :500]))
    cap0 = index.capacity
    ids = np.asarray(index.add(jnp.asarray(x)))
    assert index.capacity > cap0
    _check_decoded_cache(index, residual=False, rerank=True)
    # rerank codes moved with their rows: re-encoding the stored rows'
    # second-stage residual reproduces the aux store
    live = np.flatnonzero(~np.asarray(index._is_empty))
    addr = jnp.asarray(live[:64])
    ids_at = np.asarray(index.get_id_by_address(addr))
    orig = x.T[ids_at]  # [64, d] original vectors for those rows
    codes = index.storage_rows(addr)  # pack-aware view
    dec1 = np.asarray(index.pq_codec.decode_nd(codes))
    expect_r = np.asarray(index.rerank_codec.encode_nd(
        jnp.asarray(orig - dec1)))
    got_r = np.asarray(index.aux("rerank_codes")[addr])
    np.testing.assert_array_equal(got_r, expect_r)
    index.n_probe = 8
    _, got = index.search(jnp.asarray(x[:, :16]), k=1)
    assert np.asarray(got)[:, 0].tolist() == ids[:16].tolist()
