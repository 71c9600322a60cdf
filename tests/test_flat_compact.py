"""Compacted flat-scan cache (index/ivfpq.py:_compact_flat_cache) and the
bf16-safe save/load path (module.py).

Cells are over-allocated (pow2 capacities), so the exhaustive flat sweep
would otherwise scan 2-4x more slots than live items; the compaction must
be address-exact and invalidate on every container mutation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import IVFPQIndex


@pytest.fixture
def built():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5000, 32)).astype(np.float32)
    ix = IVFPQIndex(d_vector=32, n_subvectors=16, n_cells=32,
                    initial_size=1024)
    ix.train(jnp.asarray(x[:3000].T))
    ids = np.asarray(ix.add(jnp.asarray(x.T)))
    return ix, x, ids


def test_flat_compact_matches_full_probe(built):
    ix, x, ids = built
    assert ix.capacity > ix.n_items  # compaction actually engages
    q = x[:64]
    ix.use_approx_topk = False
    ix.scan_mode = "flat"
    v1, p1 = ix.search(jnp.asarray(q.T), k=10)
    amap = ix._flat_cache[1][3]
    assert amap is not None and amap.shape[0] < ix.capacity
    ix.scan_mode = "auto"
    ix.n_probe = 32  # full probing == same ADC ceiling
    v2, p2 = ix.search(jnp.asarray(q.T), k=10)
    agree = np.mean([len(np.intersect1d(a, b))
                     for a, b in zip(np.asarray(p1), np.asarray(p2))]) / 10
    assert agree > 0.99
    np.testing.assert_allclose(np.sort(np.asarray(v1)),
                               np.sort(np.asarray(v2)), rtol=1e-2, atol=1e-2)


def test_flat_compact_invalidates_on_remove(built):
    ix, x, ids = built
    ix.scan_mode = "flat"
    q = jnp.asarray(x[:32].T)
    ix.search(q, k=5)
    ver0 = ix._flat_cache[0]
    ix.remove(ids=ids[:1000])
    _, p = ix.search(q, k=5)
    assert ix._flat_cache[0] != ver0
    leaked = set(np.asarray(p).ravel().tolist()) & set(ids[:1000].tolist())
    assert not leaked


def test_flat_compact_invalidates_on_add(built):
    ix, x, ids = built
    ix.scan_mode = "flat"
    rng = np.random.default_rng(7)
    extra = rng.normal(size=(8, 32)).astype(np.float32)
    ix.search(jnp.asarray(x[:8].T), k=5)
    new_ids = np.asarray(ix.add(jnp.asarray(extra.T)))
    # the new vectors must be findable immediately (cache rebuilt)
    _, p = ix.search(jnp.asarray(extra.T), k=1)
    hits = np.mean(np.asarray(p)[:, 0] == new_ids)
    assert hits >= 0.75  # PQ top-1 self-recall; most must resolve


def test_auto_planner_routes_high_n_probe_to_flat(built):
    """scan_mode='auto' serves high-n_probe requests with the exhaustive
    sweep (measured faster on MXU past the crossover) — the flat cache gets
    built and results hit the ADC ceiling."""
    ix, x, ids = built
    ix.scan_mode = "auto"
    ix.use_approx_topk = True  # the planner only routes to flat under the
    ix.n_probe = 32            # measured approx epilogue (index/ivfpq.py)
    assert ix._flat_cache is None
    v, p = ix.search(jnp.asarray(x[:16].T), k=5)
    assert ix._flat_cache is not None
    ix.scan_mode = "flat"
    v2, p2 = ix.search(jnp.asarray(x[:16].T), k=5)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p2))


def test_save_load_bf16_roundtrip(tmp_path, built):
    ix, x, ids = built
    assert str(ix.aux("decoded").dtype) == "bfloat16"
    path = str(tmp_path / "ix.npz")
    ix.save(path)
    ix2 = IVFPQIndex(d_vector=32, n_subvectors=16, n_cells=32)
    ix2.load(path)
    assert str(ix2.aux("decoded").dtype) == "bfloat16"
    q = jnp.asarray(x[:16].T)
    v1, p1 = ix.search(q, k=5)
    v2, p2 = ix2.search(q, k=5)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_save_load_orbax_roundtrip(tmp_path, built):
    ix, x, ids = built
    path = str(tmp_path / "ckpt_orbax")
    ix.save(path, format="orbax")
    ix2 = IVFPQIndex(d_vector=32, n_subvectors=16, n_cells=32)
    ix2.load(path)
    assert str(ix2.aux("decoded").dtype) == "bfloat16"
    q = jnp.asarray(x[:16].T)
    v1, p1 = ix.search(q, k=5)
    v2, p2 = ix2.search(q, k=5)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_cell_compacted_scan_matches_uncompacted(built):
    """The cell-aware compacted layout must return identical results to the
    capacity-layout scan (same cells scanned, same exact select), including
    after removals punch holes into the storage."""
    ix, x, ids = built
    ix.remove(ids[100:400])
    ix.use_approx_topk = False
    ix.scan_mode = "cell_major"
    ix.n_probe = 4
    q = jnp.asarray(x[:64].T)
    ix.scan_compact = False
    v1, p1 = ix.search(q, k=10)
    ix.scan_compact = True
    dec, nrm, emp, amap, sc, cs_live, sz_live, s_live = ix._cell_compacted()
    assert s_live < ix.max_cell_capacity or ix.capacity == dec.shape[0]
    v2, p2 = ix.search(q, k=10)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    # removed ids never come back from the compacted path
    assert not (set(np.asarray(p2).ravel().tolist())
                & set(ids[100:400].tolist()))
    # mutation invalidates the cached layout
    ver0 = ix._compact_cache[0]
    ix.add(jnp.asarray(x[:32].T))
    _ = ix.search(q, k=10)
    assert ix._compact_cache[0] != ver0


def test_cell_compacted_pallas_approx(built):
    """Pallas approx kernel accepts the compacted (multiple-of-128, not
    pow2) window width."""
    ix, x, ids = built
    ix.use_approx_topk = True
    ix.scan_impl = "pallas"
    ix.scan_mode = "cell_major"
    ix.scan_compact = True
    ix.n_probe = 8
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # gate failure warns -> fail test
        v, p = ix.search(jnp.asarray(x[:32].T), k=5)
    hit = (np.asarray(p)[:, 0] == ids[:32]).mean()
    assert hit >= 0.9, hit
