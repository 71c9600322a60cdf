"""Multi-chip tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp

from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.parallel import get_mesh, ShardedIVFPQSearcher
from torchpq_tpu.parallel.sharded_ivfpq import data_parallel_lloyd_step


def _filled_index(rng, d=32, n=1600, n_cells=16):
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=n_cells,
                       scan_cache_dtype="float32", initial_size=32)
    index.train(jnp.asarray(x.T))
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    return index, x, ids


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_search_matches_single_device(rng):
    index, x, ids = _filled_index(rng)
    index.n_probe = 8
    index.use_smart_probing = False
    index.scan_mode = "cell_major"  # pin: auto may plan a flat sweep
    q = x[:40]
    v1, i1 = index.search(jnp.asarray(q.T), k=5)

    mesh = get_mesh(8)
    searcher = ShardedIVFPQSearcher(index, mesh=mesh)
    v2, i2 = searcher.search(jnp.asarray(q.T), k=5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-3, atol=1e-3)
    # id agreement (ties may reorder)
    agree = (np.asarray(i1) == np.asarray(i2)).mean()
    assert agree > 0.95, agree


def test_sharded_search_query_major_mode(rng):
    index, x, ids = _filled_index(rng, n=800)
    index.n_probe = 4
    index.use_smart_probing = False
    index.scan_mode = "query_major"  # pin: auto may plan a flat sweep
    q = x[:10]
    v1, i1 = index.search(jnp.asarray(q.T), k=3)
    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(8),
                                    scan_mode="query_major")
    v2, i2 = searcher.search(jnp.asarray(q.T), k=3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-3, atol=1e-3)


def test_data_parallel_lloyd_step(rng):
    d, k, n = 16, 8, 1024
    mesh = get_mesh(8)
    data = rng.normal(size=(n, d)).astype(np.float32)
    cents = data[:k].copy()
    data_sh = jnp.asarray(data.reshape(8, n // 8, d))

    got = np.asarray(data_parallel_lloyd_step(
        mesh, data_sh, jnp.asarray(cents), "euclidean"))

    # single-device oracle
    s = -((data[:, None] - cents[None]) ** 2).sum(-1)
    labels = s.argmax(1)
    want = np.stack([
        data[labels == j].mean(0) if (labels == j).any() else cents[j]
        for j in range(k)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_add_then_search(rng):
    index, x, ids = _filled_index(rng, n=800, n_cells=16)
    index.n_probe = 8
    index.use_smart_probing = False
    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(8))
    # add NEW vectors through the sharded path
    y = rng.normal(size=(200, 32)).astype(np.float32)
    new_ids = np.asarray(searcher.add(jnp.asarray(y.T)))
    assert len(np.unique(new_ids)) == 200
    v, got = searcher.search(jnp.asarray(y.T), k=3)
    hit = (np.asarray(got) == new_ids[:, None]).any(1).mean()
    assert hit > 0.9, hit
    # originals still findable
    v, got0 = searcher.search(jnp.asarray(x[:50].T), k=3)
    hit0 = (np.asarray(got0) == ids[:50, None]).any(1).mean()
    assert hit0 > 0.9, hit0


def test_sharded_search_with_group(rng):
    index, x, ids = _filled_index(rng, n=800, n_cells=16)
    index.n_probe = 4
    index.use_smart_probing = False
    s1 = ShardedIVFPQSearcher(index, mesh=get_mesh(8), scan_group=2)
    v, got = s1.search(jnp.asarray(x[:50].T), k=3)
    hit = (np.asarray(got) == ids[:50, None]).any(1).mean()
    assert hit > 0.9, hit


def test_sharded_flat_mode_matches_single_device_flat(rng):
    """flat scan_mode on the mesh: every shard sweeps its local cache; the
    merged result must match the single-device flat scan."""
    index, x, ids = _filled_index(rng)
    q = x[:32]
    index.scan_mode = "flat"
    v1, i1 = index.search(jnp.asarray(q.T), k=5)
    index.scan_mode = "auto"

    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(8),
                                    scan_mode="flat")
    v2, i2 = searcher.search(jnp.asarray(q.T), k=5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-3, atol=1e-3)
    agree = (np.asarray(i1) == np.asarray(i2)).mean()
    assert agree > 0.9, agree


def test_sharded_add_after_removal_holes(rng):
    """Building a searcher from an index with mid-cell removal holes must
    not overwrite live rows on subsequent sharded adds (regression: the
    next-free shadow was the occupancy count, which pointed at a live slot
    when holes existed below it)."""
    index, x, ids = _filled_index(rng, n=800)
    index.remove(ids=jnp.asarray(ids[100:200]))  # holes mid-segment
    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(8))

    x_new = rng.normal(size=(50, 32)).astype(np.float32)
    new_ids = np.asarray(searcher.add(jnp.asarray(x_new.T)))
    assert len(set(new_ids.tolist()) & set(ids.tolist())) == 0

    # every surviving old vector and every new vector is still findable
    index.n_probe = 16
    live = np.concatenate([ids[:100], ids[200:]])
    q = np.concatenate([x[:50], x[250:300], x_new])
    want = np.concatenate([ids[:50], ids[250:300], new_ids])
    _, got = searcher.search(jnp.asarray(q.T), k=1)
    match = (np.asarray(got)[:, 0] == want).mean()
    assert match > 0.95, match


def test_sharded_add_empty_batch(rng):
    index, x, ids = _filled_index(rng, n=400)
    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(8))
    out = searcher.add(jnp.zeros((32, 0)))
    assert out.shape == (0,)


def test_sharded_int8_cache_matches_single_device(rng):
    """int8 caches shard with their per-slot dequant scales; results match
    the single-device int8 scan."""
    x = rng.normal(size=(1200, 32)).astype(np.float32)
    index = IVFPQIndex(d_vector=32, n_subvectors=8, n_cells=16,
                       scan_cache_dtype="int8", initial_size=128)
    index.train(jnp.asarray(x.T))
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    index.n_probe = 8
    index.use_smart_probing = False
    index.scan_mode = "cell_major"
    q = x[:32]
    v1, i1 = index.search(jnp.asarray(q.T), k=5)
    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(8))
    v2, i2 = searcher.search(jnp.asarray(q.T), k=5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-3, atol=1e-3)
    agree = (np.asarray(i1) == np.asarray(i2)).mean()
    assert agree > 0.9, agree

    # sharded adds quantize new rows and write their scales
    x_new = rng.normal(size=(40, 32)).astype(np.float32)
    new_ids = np.asarray(searcher.add(jnp.asarray(x_new.T)))
    _, got = searcher.search(jnp.asarray(x_new.T), k=1)
    match = (np.asarray(got)[:, 0] == new_ids).mean()
    assert match > 0.9, match

    # flat mode compacts the scales in lockstep
    searcher.scan_mode = "flat"
    _, got_f = searcher.search(jnp.asarray(x_new.T), k=1)
    match_f = (np.asarray(got_f)[:, 0] == new_ids).mean()
    assert match_f > 0.9, match_f


def test_sharded_remove(rng):
    index, x, ids = _filled_index(rng, n=800)
    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(8))
    removed = searcher.remove(ids[:100])
    assert removed == 100
    assert searcher.remove(ids[:100]) == 0  # already gone
    index.n_probe = 16
    _, got = searcher.search(jnp.asarray(x[:200].T), k=1)
    got = np.asarray(got)[:, 0]
    assert not set(got[:100].tolist()) & set(ids[:100].tolist())
    match = (got[100:200] == ids[100:200]).mean()
    assert match > 0.95, match
    # flat mode sees the removals too (compaction rebuilds)
    searcher.scan_mode = "flat"
    _, got_f = searcher.search(jnp.asarray(x[:100].T), k=1)
    assert not (set(np.asarray(got_f)[:, 0].tolist())
                & set(ids[:100].tolist()))


def test_data_parallel_kmeans_fit(rng):
    from torchpq_tpu.parallel.sharded_ivfpq import data_parallel_kmeans_fit
    from torchpq_tpu.clustering import KMeans
    x = rng.normal(size=(1001, 16)).astype(np.float32)  # non-divisible n
    cents, iters = data_parallel_kmeans_fit(
        x, 8, mesh=get_mesh(8), max_iter=10, tol=0.0, seed=3)
    assert cents.shape == (8, 16) and iters == 10
    # quality parity: inertia within 10% of the single-device fit
    km = KMeans(n_clusters=8, max_iter=10, tol=0.0, seed=3)
    km.fit(jnp.asarray(x.T))
    from torchpq_tpu.ops.max_sim import max_sim
    dp_inertia = -float(jnp.mean(max_sim(jnp.asarray(x), cents,
                                         "euclidean")[0]))
    sd_inertia = -float(jnp.mean(max_sim(
        jnp.asarray(x), km._centroids[0], "euclidean")[0]))
    assert dp_inertia <= sd_inertia * 1.1, (dp_inertia, sd_inertia)


def test_sharded_on_partial_mesh(rng):
    """A 4-device mesh on an 8-device host: non-full meshes must work."""
    index, x, ids = _filled_index(rng, n=800, n_cells=16)
    index.n_probe = 8
    index.use_smart_probing = False
    index.scan_mode = "cell_major"
    v1, i1 = index.search(jnp.asarray(x[:20].T), k=3)
    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(4))
    assert searcher.n_shards == 4
    v2, i2 = searcher.search(jnp.asarray(x[:20].T), k=3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-3, atol=1e-3)


def test_data_parallel_search_matches_single_device(rng):
    from torchpq_tpu.parallel.sharded_ivfpq import data_parallel_search
    index, x, ids = _filled_index(rng, n=800)
    index.n_probe = 8
    index.use_smart_probing = False
    index.scan_mode = "cell_major"
    q = x[:41]  # deliberately not a multiple of the mesh size
    v1, i1 = index.search(jnp.asarray(q.T), k=5)
    v2, i2 = data_parallel_search(index, jnp.asarray(q.T), k=5,
                                  mesh=get_mesh(8))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-3, atol=1e-3)
    agree = (np.asarray(i1) == np.asarray(i2)).mean()
    assert agree > 0.95, agree


def test_data_parallel_search_has_no_side_effects(rng):
    """data_parallel_search must leave the caller's index exactly as it
    found it: same array objects (placement included), same derived
    caches — a later single-device search must not inherit the replicated
    sharding."""
    from torchpq_tpu.parallel.sharded_ivfpq import data_parallel_search
    index, x, ids = _filled_index(rng, n=800)
    index.n_probe = 8
    index.scan_mode = "cell_major"
    # populate derived caches
    index.scan_mode = "flat"
    _ = index.search(jnp.asarray(x[:8].T), k=3)
    index.scan_mode = "cell_major"
    before = {n: getattr(index, n) for n in
              ("_storage", "_address2id", "_is_empty", "_cell_start",
               "_cell_capacity")}
    before_aux = {n: index.aux(n) for n in index._aux}
    flat_before = index._flat_cache
    v, i = data_parallel_search(index, jnp.asarray(x[:16].T), k=3,
                                mesh=get_mesh(8))
    for n, arr in before.items():
        assert getattr(index, n) is arr, f"{n} was rebound"
    for n, arr in before_aux.items():
        assert index.aux(n) is arr, f"aux {n} was rebound"
    assert index._flat_cache is flat_before
    # and the index still searches identically afterwards
    v1, i1 = index.search(jnp.asarray(x[:16].T), k=3)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))


def test_sharded_code_domain_matches_single_device(rng):
    """scan_cache_dtype='none' shards the raw uint8 codes (the m B/slot
    memory contract survives sharding); the per-shard one-hot scan +
    ICI merge matches the single-device code-domain scan, sharded adds
    write code rows, and flat mode rides the decode-on-the-fly sweep."""
    x = rng.normal(size=(1200, 32)).astype(np.float32)
    index = IVFPQIndex(d_vector=32, n_subvectors=8, n_cells=16,
                       scan_cache_dtype="none", initial_size=128)
    index.train(jnp.asarray(x.T))
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    index.n_probe = 8
    index.use_smart_probing = False
    index.scan_mode = "cell_major"
    # pin the XLA one-hot impl: the sharded per-shard scan runs it (shards
    # are unpacked), and this test asserts SHARDING equality — the Pallas
    # codes kernel's decode-then-score rounding differs at bf16 lsb and is
    # parity-tested separately (tests/test_pallas_codes_scan.py)
    index.scan_impl = "xla"
    q = x[:32]
    v1, i1 = index.search(jnp.asarray(q.T), k=5)
    searcher = ShardedIVFPQSearcher(index, mesh=get_mesh(8))
    assert searcher.decoded.dtype == jnp.uint8  # codes, not a cache
    v2, i2 = searcher.search(jnp.asarray(q.T), k=5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-3, atol=1e-3)
    agree = (np.asarray(i1) == np.asarray(i2)).mean()
    assert agree > 0.9, agree

    # sharded adds append packed code rows
    x_new = rng.normal(size=(40, 32)).astype(np.float32)
    new_ids = np.asarray(searcher.add(jnp.asarray(x_new.T)))
    _, got = searcher.search(jnp.asarray(x_new.T), k=1)
    match = (np.asarray(got)[:, 0] == new_ids).mean()
    assert match > 0.9, match

    # flat mode: per-shard decode-on-the-fly sweep
    searcher.scan_mode = "flat"
    _, got_f = searcher.search(jnp.asarray(x_new.T), k=1)
    match_f = (np.asarray(got_f)[:, 0] == new_ids).mean()
    assert match_f > 0.9, match_f


def test_route_slots_vectorized_many_cells():
    """Slot routing must be O(arrays), not O(distinct cells) Python
    iterations: 65k cells / 200k items in well under a second, with
    arrival-order slots per cell and occupancy carried across calls."""
    import time
    from torchpq_tpu.parallel.sharded_ivfpq import ShardedIVFPQSearcher

    n_shards, n_cells = 8, 65536
    lc = n_cells // n_shards
    sr = object.__new__(ShardedIVFPQSearcher)
    sr.n_shards = n_shards
    sr._next_free = np.zeros((n_shards, lc), np.int64)
    sr._lcap_np = np.full((n_shards, lc), 64, np.int64)
    sr._lstart_np = (np.arange(lc, dtype=np.int64) * 64)[None, :].repeat(
        n_shards, axis=0)
    sr._grow_local = lambda need: (_ for _ in ()).throw(
        AssertionError("no growth expected"))

    rng2 = np.random.default_rng(11)
    cells = rng2.integers(0, n_cells, size=200_000).astype(np.int64)
    t0 = time.perf_counter()
    shard_of, slots = sr._route_slots(cells)
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"routing took {dt:.2f}s"

    np.testing.assert_array_equal(shard_of, cells % n_shards)
    # per-cell slots are lstart + 0..cnt-1 in arrival order
    for c in [int(cells[0]), 7, 65535]:
        at = np.flatnonzero(cells == c)
        start = sr._lstart_np[c % n_shards, c // n_shards]
        np.testing.assert_array_equal(slots[at], start + np.arange(len(at)))
    # occupancy shadows advanced; a second batch continues past them
    cnt7 = int((cells == 7).sum())
    assert sr._next_free[7 % n_shards, 7 // n_shards] == cnt7
    _, slots2 = sr._route_slots(np.array([7], np.int64))
    assert slots2[0] == sr._lstart_np[7 % n_shards, 7 // n_shards] + cnt7
