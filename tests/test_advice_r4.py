"""Regression tests for the round-4 advisor findings (ADVICE.md r4).

#1 (planner/dispatch gate mirror) is pinned in tests/test_planner.py
(test_codes_gate_mirror_matches_dispatch); the rest live here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.container import CellContainer
from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.index.ivfpq import _coarse_probe
from torchpq_tpu.ops import adc
from torchpq_tpu.ops.onehot_adc import scan_cell_major_codes


def _built(rng, n=1200, d=32, m=8, n_cells=8, cache="float32"):
    x = rng.normal(size=(n, d)).astype(np.float32)
    ix = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                    scan_cache_dtype=cache, initial_size=64)
    ix.train(jnp.asarray(x.T))
    ix.add(jnp.asarray(x.T))
    return ix, x


def test_deep_k_low_n_probe_returns_full_k(rng):
    """ADVICE r4 #2: approx deep-k with n_probe < ceil(k/64) must still
    return k results when the probed cells hold >= k candidates (the flat
    64-ceiling used to emit 64 winners + (-inf, -1) padding)."""
    ix, x = _built(rng, n=1200, n_cells=4)
    q = jnp.asarray(rng.normal(size=(5, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, ix.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=1, use_smart=False, precision=None)
    vals, addrs = adc.scan_cell_major(
        q, cells, mask, ix.aux("decoded"), ix.aux("norm")[:, 0],
        ix._is_empty, ix._cell_start, ix._cell_capacity,
        k=100, distance="euclidean", s_max=ix.max_cell_capacity,
        n_cells=4, approx=True, impl="auto", interpret=True)
    vals, addrs = np.asarray(vals), np.asarray(addrs)
    # every probed cell holds ~300 items, far more than k=100
    assert (addrs >= 0).all(), addrs.min()
    assert np.isfinite(vals).all()


def test_deep_k_low_n_probe_returns_full_k_codes(rng):
    """Same completeness floor on the code-domain scan."""
    ix, x = _built(rng, n=1200, n_cells=4, cache="none")
    m = ix.code_size if ix.pack_group > 1 else None
    q = jnp.asarray(rng.normal(size=(5, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, ix.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=1, use_smart=False, precision=None)
    vals, addrs = scan_cell_major_codes(
        q, cells, mask, ix._storage, ix.aux("norm")[:, 0],
        ix._is_empty, ix._cell_start, ix._cell_capacity,
        ix.pq_codec.codebook_internal, k=100, distance="euclidean",
        s_max=ix.max_cell_capacity, n_cells=4, approx=True, m=m,
        interpret=True)
    addrs = np.asarray(addrs)
    assert (addrs >= 0).all(), addrs.min()


def test_codes_scan_accepts_small_block_chunk(rng):
    """ADVICE r4 #4: block_chunk=1/2 must not trip the kernel's b % bps
    assertion (bps is clamped to divide block_chunk)."""
    ix, x = _built(rng, n=600, n_cells=4, cache="none")
    m = ix.code_size if ix.pack_group > 1 else None
    q = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, ix.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=2, use_smart=False, precision=None)
    for bc in (1, 2):
        vals, addrs = scan_cell_major_codes(
            q, cells, mask, ix._storage, ix.aux("norm")[:, 0],
            ix._is_empty, ix._cell_start, ix._cell_capacity,
            ix.pq_codec.codebook_internal, k=4, distance="euclidean",
            s_max=ix.max_cell_capacity, n_cells=4, approx=True, m=m,
            block_chunk=bc, interpret=True)
        assert (np.asarray(addrs) >= 0).any()


def test_penalty_staging_big_cache_path_matches(rng, monkeypatch):
    """The huge-cache penalty staging (per-block 1-D dynamic slices — the
    r5 fix for the 100M layout-wall temp) must return the same scan
    results as the 16-row gather staging."""
    ix, x = _built(rng, n=1200, n_cells=4, cache="none")
    m = ix.code_size if ix.pack_group > 1 else None
    q = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, ix.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=2, use_smart=False, precision=None)
    args = (q, cells, mask, ix._storage, ix.aux("norm")[:, 0],
            ix._is_empty, ix._cell_start, ix._cell_capacity,
            ix.pq_codec.codebook_internal)
    kw = dict(k=8, distance="euclidean", s_max=ix.max_cell_capacity,
              n_cells=4, approx=True, m=m, interpret=True)
    v_small, a_small = scan_cell_major_codes(*args, **kw)
    monkeypatch.setattr(adc, "_PEN_GATHER_BYTES", 0)
    # new jit trace: k differs so the cached executable isn't reused
    v_big, a_big = scan_cell_major_codes(*args, **{**kw, "k": 9})
    np.testing.assert_array_equal(np.asarray(a_small),
                                  np.asarray(a_big)[:, :8])
    np.testing.assert_allclose(np.asarray(v_small),
                               np.asarray(v_big)[:, :8], rtol=1e-5)


def test_packed_set_data_duplicate_addresses_last_wins(rng):
    """ADVICE r4 #5: duplicate addresses in set_data_by_address resolve to
    the LAST item's bytes on the packed layout, matching batch-order
    scatter semantics."""
    c = CellContainer(code_size=8, n_cells=2, initial_size=32, dtype="uint8",
                      pack_group=16)
    data = rng.integers(0, 255, size=(8, 6)).astype(np.uint8)
    cells = jnp.asarray(np.array([0, 0, 0, 1, 1, 1]))
    ids, addr = c.add(jnp.asarray(data), cells=cells, return_address=True)
    addr = np.asarray(addr)
    # write two different rows to the SAME address (plus one distinct)
    new = rng.integers(0, 255, size=(8, 3)).astype(np.uint8)
    dup_addr = jnp.asarray(np.array([addr[0], addr[0], addr[3]]))
    c.set_data_by_address(jnp.asarray(new), dup_addr)
    got = np.asarray(c.get_data_by_address(jnp.asarray(addr[[0, 3]])))
    np.testing.assert_array_equal(got[:, 0], new[:, 1])  # last dup wins
    np.testing.assert_array_equal(got[:, 1], new[:, 2])
    # neighbors in the same packed row are untouched
    got1 = np.asarray(c.get_data_by_address(jnp.asarray(addr[[1, 2]])))
    np.testing.assert_array_equal(got1, data[:, [1, 2]])


def test_merge_taper_deep_k(rng):
    """scan_merge_taper (rank-tapered deep-k merge): disabled when the
    taper covers everything; when active, returns k valid results that
    heavily overlap the untapered merge (tail pairs rarely hold deep
    winners)."""
    ix, x = _built(rng, n=3000, n_cells=8)
    q = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, ix.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=8, use_smart=False, precision=None)
    args = (q, cells, mask, ix.aux("decoded"), ix.aux("norm")[:, 0],
            ix._is_empty, ix._cell_start, ix._cell_capacity)
    kw = dict(k=64, distance="euclidean", s_max=ix.max_cell_capacity,
              n_cells=8, approx=True, impl="auto", interpret=True,
              k_pair=32)
    v0, a0 = adc.scan_cell_major(*args, **kw)
    # p0 >= n_probe disables the taper: identical trace semantics
    v1, a1 = adc.scan_cell_major(*args, merge_taper=(8, 8), **kw)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    # active taper: full k results, high overlap with the untapered merge
    v2, a2 = adc.scan_cell_major(*args, merge_taper=(2, 8), **kw)
    a0n, a2n = np.asarray(a0), np.asarray(a2)
    assert (a2n >= 0).all()
    overlap = np.mean([len(set(a2n[i]) & set(a0n[i])) / 64
                       for i in range(8)])
    assert overlap >= 0.7, overlap
