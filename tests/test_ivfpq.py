import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import IVFPQIndex, IVFPQRIndex
from torchpq_tpu.ops import adc


def _make_index(rng, d=32, m=8, n_cells=16, n=1200, distance="euclidean",
                residual=False, cache="float32", **kw):
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       distance=distance, pq_use_residual=residual,
                       scan_cache_dtype=cache, initial_size=32, **kw)
    index.train(jnp.asarray(x.T))
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    return index, x, ids


def test_scan_matches_lut_oracle(rng):
    """Both scan strategies must reproduce LUT-gather ADC scores exactly
    (f32 cache)."""
    index, x, ids = _make_index(rng)
    nq, k, n_probe = 9, 8, 4
    q = rng.normal(size=(nq, index.d_vector)).astype(np.float32)
    index.n_probe = n_probe
    index.use_smart_probing = False

    # oracle: LUT scores over each query's probed cells
    from torchpq_tpu.index.ivfpq import _coarse_probe
    _, cells, mask = _coarse_probe(
        jnp.asarray(q), index.vq_codec.kmeans._centroids[0],
        jnp.float32(30.0), n_probe=n_probe, use_smart=False, precision=None)
    lut = adc.build_adc_table(jnp.asarray(q), index.pq_codec.codebook_internal,
                              "euclidean")
    all_rows = index.storage_rows(
        jnp.arange(index.capacity, dtype=jnp.int32))  # pack-aware view
    starts = np.asarray(index._cell_start)
    caps = np.asarray(index._cell_capacity)
    empty = np.asarray(index._is_empty)
    scores_all = np.asarray(adc.adc_lookup_scores(lut, all_rows))
    want_vals = np.full((nq, k), -np.inf, np.float32)
    for qi in range(nq):
        cand = []
        for c in np.asarray(cells)[qi]:
            s, w = starts[c], caps[c]
            for a in range(s, s + w):
                if not empty[a]:
                    cand.append(scores_all[qi, a])
        cand = np.sort(np.array(cand))[::-1][:k]
        want_vals[qi, :len(cand)] = cand

    for mode in ["query_major", "cell_major"]:
        index._ivfpq_topk.mode = mode
        vals, got_ids = index.search_cells(jnp.asarray(q.T), cells,
                                           probe_mask=mask, k=k)
        np.testing.assert_allclose(np.asarray(vals), want_vals,
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"mode={mode}")


def test_full_probe_equals_pq_bruteforce(rng):
    """n_probe = n_cells must equal brute-force ADC over all codes."""
    index, x, ids = _make_index(rng, n_cells=8, n=600)
    nq, k = 6, 10
    q = rng.normal(size=(nq, index.d_vector)).astype(np.float32)
    index.n_probe = index.n_cells
    index.use_smart_probing = False
    vals, got_ids = index.search(jnp.asarray(q.T), k=k)

    decoded = np.asarray(index.aux("decoded")).astype(np.float32)
    a2i = np.asarray(index._address2id)
    live = a2i >= 0
    s = -((q[:, None] - decoded[None]) ** 2).sum(-1)
    s[:, ~live] = -np.inf
    order = np.argsort(-s, axis=1)[:, :k]
    want_ids = a2i[order]
    agree = (np.asarray(got_ids) == want_ids).mean()
    assert agree > 0.99, f"agreement {agree}"


@pytest.mark.parametrize("distance", ["euclidean", "inner", "cosine"])
def test_recall_on_blobs(rng, distance):
    """IVFPQ with decent n_probe must find true neighbors of stored points."""
    d, n = 32, 2000
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=16, n_cells=16,
                       distance=distance, initial_size=64)
    index.train(jnp.asarray(x.T))
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    index.n_probe = 8
    q = x[:100]
    vals, got = index.search(jnp.asarray(q.T), k=10)
    # self-recall: the stored copy of the query should be in the top-10
    hit = (np.asarray(got) == ids[:100, None]).any(1).mean()
    assert hit > 0.9, f"self-recall@10 {hit} ({distance})"


def test_residual_mode(rng):
    index, x, ids = _make_index(rng, residual=True, n_cells=8)
    index.n_probe = 8
    index.use_smart_probing = False
    q = x[:50]
    vals, got = index.search(jnp.asarray(q.T), k=5)
    hit = (np.asarray(got) == ids[:50, None]).any(1).mean()
    assert hit > 0.9
    # residual reconstruction should beat non-residual distortion
    dec = np.asarray(index.aux("decoded"))
    a2i = np.asarray(index._address2id)
    addr = np.asarray(index.get_address_by_id(ids))
    err = ((dec[addr] - x) ** 2).mean()
    index2, x2, ids2 = _make_index(rng, residual=False, n_cells=8)
    # (just sanity: errors are finite and small-ish)
    assert np.isfinite(err)


def test_smart_probing_masks_tail(rng):
    index, x, ids = _make_index(rng)
    index.n_probe = 8
    index.use_smart_probing = True
    index.smart_probing_temperature = 30.0
    q = x[:20]
    vals, got = index.search(jnp.asarray(q.T), k=5)
    assert np.isfinite(np.asarray(vals)[:, 0]).all()


def test_add_remove_search(rng):
    index, x, ids = _make_index(rng, n=800, n_cells=8)
    index.n_probe = 8
    index.use_smart_probing = False
    index.remove(ids=ids[:400])
    assert index.n_items == 400
    q = x[400:420]
    vals, got = index.search(jnp.asarray(q.T), k=5)
    g = np.asarray(got)
    assert np.all((g >= 400) | (g == -1))
    hit = (g == ids[400:420, None]).any(1).mean()
    assert hit > 0.9


def test_encode_decode_roundtrip(rng):
    index, x, ids = _make_index(rng)
    code = index.encode(jnp.asarray(x[:50].T))
    recon = np.asarray(index.decode(code))
    assert recon.shape == (index.d_vector, 50)
    assert ((recon - x[:50].T) ** 2).mean() < (x ** 2).mean()


def test_save_load_search_identical(tmp_path, rng):
    index, x, ids = _make_index(rng)
    index.n_probe = 4
    q = x[:10]
    v1, i1 = index.search(jnp.asarray(q.T), k=5)
    path = str(tmp_path / "index.npz")
    index.save(path)
    index2 = IVFPQIndex(d_vector=32, n_subvectors=8, n_cells=16,
                        scan_cache_dtype="float32", initial_size=32)
    index2.load(path)
    index2.n_probe = 4
    v2, i2 = index2.search(jnp.asarray(q.T), k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_ivfpqr_reranks(rng):
    d, n = 32, 1500
    x = rng.normal(size=(n, d)).astype(np.float32)
    r = IVFPQRIndex(d_vector=d, n_subvectors=4, n_subvectors_rerank=16,
                    n_cells=8, scan_cache_dtype="float32", initial_size=64)
    r.train(jnp.asarray(x.T))
    rids = np.asarray(r.add(jnp.asarray(x.T)))
    r.n_probe = 8
    r.use_smart_probing = False
    q = x[:100] + 0.01 * rng.normal(size=(100, d)).astype(np.float32)
    _, got_r = r.search(jnp.asarray(q.T), k=1)
    hit_r = (np.asarray(got_r)[:, 0] == rids[:100]).mean()

    b = IVFPQIndex(d_vector=d, n_subvectors=4, n_cells=8,
                   scan_cache_dtype="float32", initial_size=64)
    b.train(jnp.asarray(x.T))
    bids = np.asarray(b.add(jnp.asarray(x.T)))
    b.n_probe = 8
    b.use_smart_probing = False
    _, got_b = b.search(jnp.asarray(q.T), k=1)
    hit_b = (np.asarray(got_b)[:, 0] == bids[:100]).mean()
    assert hit_r >= hit_b, (hit_r, hit_b)
    assert hit_r > 0.8


def test_similarity_at_id(rng):
    index, x, ids = _make_index(rng)
    q = x[:5]
    sims = np.asarray(index.similarity_at_id(jnp.asarray(q.T), ids[:7]))
    assert sims.shape == (5, 7)
    decoded = np.asarray(index.aux("decoded"))
    addr = np.asarray(index.get_address_by_id(ids[:7]))
    want = -((q[:, None] - decoded[addr][None]) ** 2).sum(-1)
    np.testing.assert_allclose(sims, want, rtol=1e-3, atol=1e-3)


def test_scan_after_remove_and_readd(rng):
    """Holes from removals must never surface in results (penalty masking),
    and reused slots must score their new occupants."""
    index, x, ids = _make_index(rng, n=600, n_cells=8)
    index.n_probe = 8
    index.use_smart_probing = False
    index.remove(ids=ids[::3])
    removed = set(int(i) for i in ids[::3])
    v, got = index.search(jnp.asarray(x[:100].T), k=10)
    g = np.asarray(got)
    assert not (np.isin(g[np.asarray(np.isfinite(v))],
                        list(removed))).any()
    # re-add different vectors into the holes
    y = rng.normal(size=(200, index.d_vector)).astype(np.float32)
    new_ids = np.asarray(index.add(jnp.asarray(y.T)))
    v2, got2 = index.search(jnp.asarray(y[:50].T), k=5)
    hit = (np.asarray(got2) == new_ids[:50, None]).any(1).mean()
    assert hit > 0.9


def test_cell_major_approx_pack32_matches_exact(rng):
    """approx=True engages the packed-int32 merge (ops/adc.py pack32);
    results must agree with the exact path up to approx-top-k recall and
    the 12-bit value quantization."""
    index, x, ids = _make_index(rng, n=2000, n_cells=16)
    nq, k, n_probe = 32, 10, 6
    q = rng.normal(size=(nq, index.d_vector)).astype(np.float32)
    index.use_smart_probing = False
    index.scan_mode = "cell_major"

    index.use_approx_topk = False
    v_exact, id_exact = index.search(jnp.asarray(q.T), k=k)
    index.use_approx_topk = True
    v_pack, id_pack = index.search(jnp.asarray(q.T), k=k)

    v_exact, v_pack = np.asarray(v_exact), np.asarray(v_pack)
    overlap = np.mean([
        len(np.intersect1d(a, b)) / k
        for a, b in zip(np.asarray(id_exact), np.asarray(id_pack))])
    assert overlap > 0.9, f"overlap {overlap}"
    # value agreement on the overlapping prefix (quantization ~2^-11 rel)
    np.testing.assert_allclose(v_pack[:, 0], v_exact[:, 0],
                               rtol=2e-3, atol=2e-3)


def test_cell_major_pack32_with_group_and_int8(rng):
    """pack32 composes with supercell grouping and the int8 cache."""
    index, x, ids = _make_index(rng, n=1500, n_cells=16, cache="int8")
    nq, k = 16, 8
    q = rng.normal(size=(nq, index.d_vector)).astype(np.float32)
    index.use_smart_probing = False
    index.n_probe = 6
    index.scan_mode = "cell_major"
    index.scan_group = 2
    index.use_approx_topk = True
    vals, got = index.search(jnp.asarray(q.T), k=k)

    index.use_approx_topk = False
    index.scan_group = 1
    v2, want = index.search(jnp.asarray(q.T), k=k)
    # grouping scans a superset of cells; require strong top-k overlap
    overlap = np.mean([
        len(np.intersect1d(a, b)) / k
        for a, b in zip(np.asarray(got), np.asarray(want))])
    assert overlap > 0.8, f"overlap {overlap}"


def test_smart_probing_mask_matches_reference_math(rng):
    """_coarse_probe's entropy-adaptive mask reproduces the reference
    formula (IVFPQIndex.py:499-512): p = softmax(-sqrt|s|/T), per-query
    budget = clip(ceil(H_norm * n_probe), 1, n_probe)."""
    from torchpq_tpu.index.ivfpq import _coarse_probe
    nq, k_cells, d, n_probe, temp = 32, 64, 16, 8, 30.0
    q = jnp.asarray(rng.standard_normal((nq, d)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((k_cells, d)).astype(np.float32))
    sims, cells, mask = _coarse_probe(
        q, cb, jnp.float32(temp), n_probe=n_probe, use_smart=True,
        precision=None)
    s = np.asarray(sims)
    z = -np.sqrt(np.abs(s)) / temp
    p = np.exp(z - z.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    h = -(p * np.log2(np.maximum(p, 1e-30)) / np.log2(n_probe)).sum(1)
    budget = np.clip(np.ceil(h * n_probe), 1, n_probe).astype(int)
    want = np.arange(n_probe)[None, :] < budget[:, None]
    np.testing.assert_array_equal(np.asarray(mask), want)
    # budgets must actually vary with query sharpness on random data
    assert budget.min() >= 1 and budget.max() <= n_probe


def test_deep_k_exact_merge_matches_bruteforce(rng):
    """k > 32 takes the bitonic run-merge final stage (ops/bitonic.py) in
    both the exact and pack32 scan paths; at full probe it must match
    brute-force ADC exactly (the merge replaces lax.top_k, not the
    ranking)."""
    index, x, ids = _make_index(rng, n_cells=8, n=900)
    nq, k = 7, 100
    q = rng.normal(size=(nq, index.d_vector)).astype(np.float32)
    index.n_probe = index.n_cells
    index.use_smart_probing = False
    index.scan_mode = "cell_major"

    decoded = np.asarray(index.aux("decoded")).astype(np.float32)
    a2i = np.asarray(index._address2id)
    live = a2i >= 0
    s = -((q[:, None] - decoded[None]) ** 2).sum(-1)
    s[:, ~live] = -np.inf
    order = np.argsort(-s, axis=1)[:, :k]
    want_ids = a2i[order]

    index.use_approx_topk = False
    _, got_exact = index.search(jnp.asarray(q.T), k=k)
    agree = (np.asarray(got_exact) == want_ids).mean()
    assert agree > 0.99, f"exact deep-k agreement {agree}"

    index.use_approx_topk = True  # pack32 wire format + bitonic merge
    _, got_pack = index.search(jnp.asarray(q.T), k=k)
    overlap = np.mean([
        len(np.intersect1d(a, b)) / k
        for a, b in zip(np.asarray(got_pack), want_ids)])
    assert overlap > 0.95, f"pack32 deep-k overlap {overlap}"


def test_lane_padded_cache_d_not_mult_128(rng):
    """d > 128 and not a multiple of 128 (the GIST-960 shape class): the
    decoded cache is lane-padded to the next multiple of 128 so the Pallas
    scan's window DMA tiles; zero columns must be score-invisible in every
    plan (probed scans, flat sweep, reconstruct-similarity)."""
    d, m = 160, 16
    index, x, ids = _make_index(rng, d=d, m=m, n_cells=8, n=700)
    assert index.aux("decoded").shape[1] == 256  # padded width
    nq, k = 6, 10
    q = rng.normal(size=(nq, d)).astype(np.float32)
    index.n_probe = index.n_cells
    index.use_smart_probing = False

    decoded = np.asarray(index.aux("decoded")).astype(np.float32)[:, :d]
    a2i = np.asarray(index._address2id)
    live = a2i >= 0
    s = -((q[:, None] - decoded[None]) ** 2).sum(-1)
    s[:, ~live] = -np.inf
    want_ids = a2i[np.argsort(-s, axis=1)[:, :k]]

    for mode in ("cell_major", "query_major", "flat"):
        index.scan_mode = mode
        _, got = index.search(jnp.asarray(q.T), k=k)
        agree = (np.asarray(got) == want_ids).mean()
        assert agree > 0.99, f"{mode} agreement {agree}"
    index.scan_mode = "auto"

    # relayout rebuild keeps the padded width + zero pad columns
    index.remove(ids=ids[:100])
    assert index.aux("decoded").shape[1] == 256
    sims = index.similarity_at_address(
        jnp.asarray(q.T), jnp.arange(32))
    assert np.isfinite(np.asarray(sims)).any()


def test_probe_cap_supercell_truncation(rng):
    """scan_probe_cap under supercell grouping: keeps each query's
    best-ranked distinct supercells, shrinking the static probe axis.
    With locality-ordered cells a 2x-slack cap must match the uncapped
    grouped scan almost everywhere."""
    index, x, ids = _make_index(rng, d=64, m=8, n_cells=32, n=2000)
    index.use_smart_probing = False
    index.use_approx_topk = True
    index.n_probe = 16
    index.scan_mode = "cell_major"
    index.scan_group = 4
    q = rng.normal(size=(12, 64)).astype(np.float32)

    _, base_ids = index.search(jnp.asarray(q.T), k=10)
    index.scan_probe_cap = "auto"  # 2 * 16/4 = 8 distinct supercells
    _, cap_ids = index.search(jnp.asarray(q.T), k=10)
    overlap = np.mean([
        len(np.intersect1d(a, b)) / 10
        for a, b in zip(np.asarray(base_ids), np.asarray(cap_ids))])
    assert overlap > 0.9, f"probe_cap overlap {overlap}"

    # explicit int cap smaller than n_probe also works and stays sane
    index.scan_probe_cap = 4
    vals, got = index.search(jnp.asarray(q.T), k=10)
    assert np.isfinite(np.asarray(vals)[:, 0]).all()
    index.scan_probe_cap = None


def test_scan_k_pair_override(rng):
    """scan_k_pair pins the per-pair partial width: k_pair == k reproduces
    the auto result exactly; a narrower k_pair is legal, shapes hold, and
    at full probe coverage the top-1 still matches (the best candidate
    survives any k_pair >= 1)."""
    index, x, ids = _make_index(rng)
    q = rng.normal(size=(6, index.d_vector)).astype(np.float32)
    index.n_probe = index.n_cells  # full coverage: results are exact ADC
    index.use_approx_topk = False
    k = 12
    v0, i0 = index.search(jnp.asarray(q.T), k=k)
    index.scan_k_pair = k
    v1, i1 = index.search(jnp.asarray(q.T), k=k)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    index.scan_k_pair = 4
    v2, i2 = index.search(jnp.asarray(q.T), k=k)
    assert np.asarray(i2).shape == (6, k)
    np.testing.assert_array_equal(np.asarray(i2)[:, 0], np.asarray(i0)[:, 0])


def test_deep_k_wide_merge_matches_bruteforce(rng):
    """n_probe * k_pair >= 2048 routes the final merge to the fused
    lax.top_k branch (faster than the bitonic tree at width — r4
    profile_deepk); it must preserve exactness/overlap identically."""
    index, x, ids = _make_index(rng, n_cells=32, n=2400)
    nq, k = 5, 100
    q = rng.normal(size=(nq, index.d_vector)).astype(np.float32)
    index.n_probe = index.n_cells  # 32 * k_pair(100|64) >= 2048: wide
    index.use_smart_probing = False
    index.scan_mode = "cell_major"

    decoded = np.asarray(index.aux("decoded")).astype(np.float32)
    a2i = np.asarray(index._address2id)
    live = a2i >= 0
    s = -((q[:, None] - decoded[None]) ** 2).sum(-1)
    s[:, ~live] = -np.inf
    order = np.argsort(-s, axis=1)[:, :k]
    want_ids = a2i[order]

    index.use_approx_topk = False
    _, got_exact = index.search(jnp.asarray(q.T), k=k)
    agree = (np.asarray(got_exact) == want_ids).mean()
    assert agree > 0.99, f"exact wide-merge agreement {agree}"

    index.use_approx_topk = True
    _, got_pack = index.search(jnp.asarray(q.T), k=k)
    overlap = np.mean([
        len(np.intersect1d(a, b)) / k
        for a, b in zip(np.asarray(got_pack), want_ids)])
    assert overlap > 0.95, f"pack32 wide-merge overlap {overlap}"


def test_super_probe_matches_dedup_path(rng):
    """Supercell-native probing (scan_super_probe, the default) vs the
    cell-level dedup+cap path: when every supercell is probed by both
    (n_probe covers all cells, cap = n_super), the scanned sets coincide
    and results must be identical; at a tighter cap the two selections
    still overlap almost everywhere (cell rank IS score rank)."""
    index, x, ids = _make_index(rng, d=64, m=8, n_cells=16, n=1500)
    index.use_smart_probing = False
    index.use_approx_topk = True
    index.scan_mode = "cell_major"
    index.scan_group = 4
    index.n_probe = 16
    index.scan_probe_cap = 4  # == n_super: both paths scan everything
    q = rng.normal(size=(11, 64)).astype(np.float32)

    assert index.scan_super_probe
    v_sup, i_sup = index.search(jnp.asarray(q.T), k=10)
    index.scan_super_probe = False
    v_ded, i_ded = index.search(jnp.asarray(q.T), k=10)
    np.testing.assert_array_equal(np.asarray(i_sup), np.asarray(i_ded))
    np.testing.assert_allclose(np.asarray(v_sup), np.asarray(v_ded),
                               rtol=1e-5, atol=1e-5)

    # tighter cap: selections may differ on ties but overlap nearly always
    index.scan_probe_cap = 2
    index.scan_super_probe = True
    _, i_sup2 = index.search(jnp.asarray(q.T), k=10)
    index.scan_super_probe = False
    _, i_ded2 = index.search(jnp.asarray(q.T), k=10)
    overlap = np.mean([
        len(np.intersect1d(a, b)) / 10
        for a, b in zip(np.asarray(i_sup2), np.asarray(i_ded2))])
    assert overlap > 0.8, f"super-probe overlap {overlap}"
    index.scan_super_probe = True
    index.scan_probe_cap = None


def test_split_taper_matches_single_launch(rng):
    """scan_split_taper (the default): an engaged merge taper run as two
    scans (head at full k_pair, tail at kp_tail) + one final top-k
    returns the same neighbors as the single-launch tapered merge up to
    approx-select binning (the bin count tracks each side's k_pair), so
    the pools must agree almost everywhere and exactly at the top."""
    index, x, ids = _make_index(rng, d=64, m=8, n_cells=32, n=2600)
    index.use_smart_probing = False
    index.use_approx_topk = True
    index.scan_mode = "cell_major"
    index.scan_group = 4
    index.n_probe = 24
    index.scan_probe_cap = 8
    index.scan_merge_taper = (2, 8)
    index.scan_k_pair = 48
    q = rng.normal(size=(13, 64)).astype(np.float32)

    assert index.scan_split_taper
    v_split, i_split = index.search(jnp.asarray(q.T), k=48)
    index.scan_split_taper = False
    v_one, i_one = index.search(jnp.asarray(q.T), k=48)

    # approx-select binning differs per side, so pools agree almost
    # everywhere (not bitwise); the top hit must match exactly
    overlap = np.mean([
        len(np.intersect1d(a, b)) / 48
        for a, b in zip(np.asarray(i_split), np.asarray(i_one))])
    assert overlap > 0.9, f"split-taper overlap {overlap}"
    np.testing.assert_array_equal(np.asarray(i_split)[:, 0],
                                  np.asarray(i_one)[:, 0])
    index.scan_split_taper = True
    index.scan_merge_taper = None
    index.scan_probe_cap = None
    index.scan_k_pair = None
