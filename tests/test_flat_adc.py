"""Flat (exhaustive) ADC scan: exactness vs brute force over the cache."""

import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.ops.flat_adc import flat_adc_scan


def _brute(q, decoded, live, distance, k):
    dec = decoded.astype(np.float32)
    if distance == "euclidean":
        s = -((q[:, None] - dec[None]) ** 2).sum(-1)
    elif distance in ("inner", "cosine"):
        s = q @ dec.T
    elif distance == "manhattan":
        s = -np.abs(q[:, None] - dec[None]).sum(-1)
    s[:, ~live] = -np.inf
    order = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, order, axis=1), order


@pytest.mark.parametrize("distance", ["euclidean", "inner", "manhattan"])
def test_flat_scan_exact(rng, distance):
    n, d, k = 700, 16, 9
    decoded = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(5, d)).astype(np.float32)
    live = np.ones(n, bool)
    live[rng.integers(0, n, 60)] = False
    big = np.float32(np.finfo(np.float32).max / 4)
    norms = (decoded ** 2).sum(-1)
    pen = np.where(~live, big, norms if distance == "euclidean" else 0.0)

    # chunk does not divide n -> exercises the clamped-last-chunk mask
    vals, addr = flat_adc_scan(
        jnp.asarray(q), jnp.asarray(decoded), jnp.asarray(pen),
        k=k, distance=distance, chunk=256, approx=False)
    want_vals, want_addr = _brute(q, decoded, live, distance, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-4,
                               atol=1e-4)
    # no duplicate addresses (the overlap-mask invariant)
    a = np.asarray(addr)
    for row in a:
        assert len(np.unique(row)) == len(row)
    np.testing.assert_array_equal(a, want_addr)


def test_flat_scan_more_k_than_live(rng):
    n, d = 40, 8
    decoded = rng.normal(size=(n, d)).astype(np.float32)
    live = np.zeros(n, bool)
    live[:5] = True
    big = np.float32(np.finfo(np.float32).max / 4)
    pen = np.where(~live, big, (decoded ** 2).sum(-1))
    q = rng.normal(size=(3, d)).astype(np.float32)
    vals, addr = flat_adc_scan(jnp.asarray(q), jnp.asarray(decoded),
                               jnp.asarray(pen), k=10, distance="euclidean",
                               chunk=16, approx=False)
    vals, addr = np.asarray(vals), np.asarray(addr)
    assert np.isfinite(vals[:, :5]).all()
    assert (addr[:, :5] < 5).all()
    assert (addr[:, 5:] == -1).all()
    assert np.isneginf(vals[:, 5:]).all()


def test_index_flat_mode_matches_bruteforce(rng):
    n, d, m, k = 900, 32, 8, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=16,
                       initial_size=32)
    index.train(jnp.asarray(x.T))
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    index.scan_mode = "flat"
    q = rng.normal(size=(6, d)).astype(np.float32)
    vals, got_ids = index.search(jnp.asarray(q.T), k=k)

    decoded = np.asarray(index.aux("decoded")).astype(np.float32)
    a2i = np.asarray(index._address2id)
    want_vals, order = _brute(q, decoded, a2i >= 0, "euclidean", k)
    # PQ gives duplicate codes -> tied scores; compare values, not ids.
    # tolerance: the scan matmul runs in bf16 (~2^-8 relative)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=6e-3,
                               atol=6e-3)
    want = a2i[order]
    overlap = np.mean([len(np.intersect1d(g, w)) / k
                       for g, w in zip(np.asarray(got_ids), want)])
    assert overlap > 0.85, f"overlap {overlap}"


def test_index_flat_mode_int8_cache(rng):
    n, d, m, k = 600, 32, 8, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=16,
                       initial_size=32, scan_cache_dtype="int8")
    index.train(jnp.asarray(x.T))
    index.add(jnp.asarray(x.T))
    index.scan_mode = "flat"
    q = rng.normal(size=(6, d)).astype(np.float32)
    vals, got_ids = index.search(jnp.asarray(q.T), k=k)

    # int8 cache quantizes scores; check top-k overlap vs dequantized brute
    decoded = (np.asarray(index.aux("decoded")).astype(np.float32)
               * np.asarray(index.aux("scale")))
    a2i = np.asarray(index._address2id)
    _, order = _brute(q, decoded, a2i >= 0, "euclidean", k)
    want = a2i[order]
    overlap = np.mean([len(np.intersect1d(g, w)) / k
                       for g, w in zip(np.asarray(got_ids), want)])
    assert overlap > 0.9, f"overlap {overlap}"


def test_flat_exact_mode_chunk_bound(rng):
    """approx=False bounds its score tile (the exact top_k materializes
    [nq, chunk]); multi-chunk exact results must equal brute force."""
    import jax.numpy as jnp
    from torchpq_tpu.ops.flat_adc import flat_adc_scan
    nq, n, d, k = 16, 5000, 16, 7
    q = jnp.asarray(rng.standard_normal((nq, d)).astype(np.float32))
    dec = rng.standard_normal((n, d)).astype(np.float32)
    pen = jnp.asarray((dec ** 2).sum(1))
    # chunk=256 forces the multi-chunk exact merge path
    v, a = flat_adc_scan(q, jnp.asarray(dec), pen, k=k,
                         distance="euclidean", chunk=256, approx=False)
    s = 2.0 * np.asarray(q) @ dec.T - (dec ** 2).sum(1)[None, :] \
        - (np.asarray(q) ** 2).sum(1)[:, None]
    want = np.argsort(-s, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(a), want)


def test_flat_scan_exact_deep_k(rng):
    """k > 32 multi-chunk exact epilogue takes the bitonic run-merge
    (ops/bitonic.py); must still equal brute force exactly."""
    n, d, k = 900, 16, 100
    decoded = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(7, d)).astype(np.float32)
    live = np.ones(n, bool)
    live[rng.integers(0, n, 50)] = False
    big = np.float32(np.finfo(np.float32).max / 4)
    pen = np.where(~live, big, (decoded ** 2).sum(-1))

    vals, addr = flat_adc_scan(
        jnp.asarray(q), jnp.asarray(decoded), jnp.asarray(pen),
        k=k, distance="euclidean", chunk=128, approx=False)
    want_vals, want_addr = _brute(q, decoded, live, "euclidean", k)
    np.testing.assert_allclose(np.asarray(vals), want_vals,
                               rtol=1e-4, atol=1e-4)
    got, want = np.asarray(addr), want_addr
    # address agreement modulo exact score ties
    agree = np.mean([len(np.intersect1d(a, b)) / k
                     for a, b in zip(got, want)])
    assert agree > 0.99, agree
