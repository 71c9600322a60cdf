"""scan_cache_dtype='none': the code-domain (one-hot matmul) scan path.

The index keeps NO decoded cache — scans read the canonical uint8 codes
(ops/onehot_adc.py). Scores must agree with the LUT-gather oracle / decoded
scan up to bf16 LUT rounding; memory must actually shrink to codes + norms.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.index.ivfpq import _coarse_probe
from torchpq_tpu.ops import adc
from torchpq_tpu.ops.onehot_adc import (scan_cell_major_codes,
                                        flat_onehot_scan, flat_decode_scan)


def _built(rng, n=1500, d=32, m=8, n_cells=8, cache="float32",
           distance="euclidean"):
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       distance=distance, scan_cache_dtype=cache,
                       initial_size=64)
    index.train(jnp.asarray(x.T))
    index.add(jnp.asarray(x.T))
    return index, x


def _m(index):
    """Static code width to hand the scan ops when the index's storage is
    in the packed-at-ingest [cap/g, g*m] layout (auto-on for eligible
    code-domain indexes since round 4)."""
    return index.code_size if index.pack_group > 1 else None


@pytest.mark.parametrize("distance", ["euclidean", "inner", "manhattan"])
def test_code_scan_matches_decoded_scan(rng, distance):
    index, x = _built(rng, distance=distance)
    nq, n_probe, k = 16, 4, 8
    q = jnp.asarray(rng.normal(size=(nq, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=n_probe, use_smart=False, precision=None)
    common = (q, cells, mask)
    tail = (index.aux("norm")[:, 0], index._is_empty, index._cell_start,
            index._cell_capacity)
    kw = dict(k=k, distance=distance, s_max=index.max_cell_capacity,
              n_cells=8)
    v_d, a_d = adc.scan_cell_major(*common, index.aux("decoded"), *tail,
                                   approx=False, **kw)
    v_c, a_c = scan_cell_major_codes(*common, index._storage, *tail,
                                     index.pq_codec.codebook_internal,
                                     approx=False, m=_m(index), **kw)
    a_d, a_c = np.asarray(a_d), np.asarray(a_c)
    # bf16 LUT rounding can flip near-ties; demand near-total agreement
    overlap = np.mean([len(set(a_c[i]) & set(a_d[i])) / k
                       for i in range(nq)])
    assert overlap >= 0.95, f"code-domain overlap {overlap}"
    v_d, v_c = np.asarray(v_d), np.asarray(v_c)
    scale = max(1.0, float(np.abs(v_d[np.isfinite(v_d)]).max()))
    for i in range(nq):
        for a in set(a_c[i]) & set(a_d[i]) - {-1}:
            dv = abs(v_c[i][a_c[i] == a][0] - v_d[i][a_d[i] == a][0])
            assert dv <= 3e-2 * scale, (i, a, dv)


@pytest.mark.parametrize("distance", ["euclidean", "inner"])
def test_flat_decode_matches_onehot_sweep(rng, distance):
    """The decode-on-the-fly sweep (flat_decode_scan) must rank like the
    one-hot LUT sweep — same math, decode amortized across queries."""
    index, x = _built(rng, cache="none", distance=distance)
    nq, k = 24, 10
    q = jnp.asarray(rng.normal(size=(nq, 32)).astype(np.float32))
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    norms = index.aux("norm")[:, 0]
    pen = jnp.where(index._is_empty, big,
                    norms if distance == "euclidean" else 0.0)
    cb = index.pq_codec.codebook_internal
    v_o, a_o = flat_onehot_scan(q, index._storage, pen, cb, k=k,
                                distance=distance, approx=False, m=_m(index))
    v_d, a_d = flat_decode_scan(q, index._storage, pen, cb, k=k,
                                distance=distance, approx=False, sub=512,
                                m=_m(index))
    a_o, a_d = np.asarray(a_o), np.asarray(a_d)
    overlap = np.mean([len(set(a_o[i]) & set(a_d[i])) / k
                       for i in range(nq)])
    assert overlap >= 0.95, f"decode-vs-onehot overlap {overlap}"
    v_o, v_d = np.asarray(v_o), np.asarray(v_d)
    scale = max(1.0, float(np.abs(v_o[np.isfinite(v_o)]).max()))
    for i in range(nq):
        for a in set(a_o[i]) & set(a_d[i]) - {-1}:
            dv = abs(v_d[i][a_d[i] == a][0] - v_o[i][a_o[i] == a][0])
            assert dv <= 3e-2 * scale, (i, a, dv)


def test_flat_decode_4bit_codebook(rng):
    """4-bit PQ code domain: packed bytes scan through the byte-pair
    codebook view ([m/2, 256, 2*dsub]), so flat_decode_scan sees the same
    [m, nc, dsub] contract as 8-bit."""
    x = rng.normal(size=(800, 32)).astype(np.float32)
    index = IVFPQIndex(d_vector=32, n_subvectors=8, n_cells=4,
                       scan_cache_dtype="none", n_bits=4, initial_size=64)
    index.train(jnp.asarray(x.T))
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    index.scan_mode = "flat"
    _, got = index.search(jnp.asarray(x[:48].T), k=1)
    hit = (np.asarray(got)[:, 0] == ids[:48]).mean()
    assert hit >= 0.9, f"4-bit flat decode self-recall {hit}"


def test_code_domain_index_end_to_end(rng):
    index, x = _built(rng, cache="none")
    assert "decoded" not in index._aux
    assert not index._int8_cache
    index.n_probe = 8
    ids = np.arange(len(x))
    _, got = index.search(jnp.asarray(x[:64].T), k=1)
    hit = (np.asarray(got)[:, 0] == ids[:64]).mean()
    assert hit >= 0.95, f"code-domain self-recall {hit}"
    # flat one-hot sweep agrees
    index.scan_mode = "flat"
    _, got_f = index.search(jnp.asarray(x[:64].T), k=1)
    hit_f = (np.asarray(got_f)[:, 0] == ids[:64]).mean()
    assert hit_f >= 0.95, f"flat code-domain self-recall {hit_f}"
    # rescoring extras work without a cache
    sims = index.similarity_at_id(jnp.asarray(x[:4].T), ids[:4])
    assert np.isfinite(np.asarray(sims)).all()


def test_code_domain_relayout_and_saveload(rng, tmp_path):
    d, n = 32, 1200
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=8,
                       scan_cache_dtype="none", initial_size=16)
    index.train(jnp.asarray(x.T[:, :600]))
    cap0 = index.capacity
    ids = np.asarray(index.add(jnp.asarray(x.T)))
    assert index.capacity > cap0, "must exercise the norm-only rebuilder"
    # norms rebuilt from codes: spot-check live rows
    live = np.flatnonzero(~np.asarray(index._is_empty))[:128]
    dec = np.asarray(index.pq_codec.decode_nd(index.storage_rows(live)))
    np.testing.assert_allclose(
        np.asarray(index.aux("norm")[live, 0]),
        (dec ** 2).sum(-1), rtol=1e-4, atol=1e-4)
    index.n_probe = 8
    _, got = index.search(jnp.asarray(x[:32].T), k=1)
    assert (np.asarray(got)[:, 0] == ids[:32]).mean() == 1.0
    path = str(tmp_path / "code_domain_idx")
    index.save(path)
    index2 = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=8,
                        scan_cache_dtype="none", initial_size=16)
    index2.load(path)
    index2.n_probe = 8
    _, got2 = index2.search(jnp.asarray(x[:32].T), k=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_gather_windows_path_matches_slice_path(rng, monkeypatch):
    """The 100M-scale row-gather window fetch (config.CODES_GATHER_BYTES)
    must select exactly what the dynamic_slice fetch selects — probed scan
    and the decode-on-the-fly flat sweep both."""
    from torchpq_tpu import config
    index, x = _built(rng, n=3000)
    nq, n_probe, k = 16, 4, 8
    q = jnp.asarray(rng.normal(size=(nq, 32)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=n_probe, use_smart=False, precision=None)
    common = (q, cells, mask, index._storage, index.aux("norm")[:, 0],
              index._is_empty, index._cell_start, index._cell_capacity,
              index.pq_codec.codebook_internal)
    kw = dict(k=k, distance="euclidean", s_max=index.max_cell_capacity,
              n_cells=8, approx=False, m=_m(index))
    v_s, a_s = scan_cell_major_codes(*common, **kw)
    monkeypatch.setattr(config, "CODES_GATHER_BYTES", 0)
    scan_cell_major_codes._clear_cache()
    v_g, a_g = scan_cell_major_codes(*common, **kw)
    np.testing.assert_array_equal(np.asarray(a_g), np.asarray(a_s))
    np.testing.assert_allclose(np.asarray(v_g), np.asarray(v_s),
                               rtol=1e-5, atol=1e-5)

    pen = jnp.where(index._is_empty, jnp.finfo(jnp.float32).max / 4,
                    index.aux("norm")[:, 0])
    fkw = dict(k=k, distance="euclidean", approx=False, chunk=512,
               m=_m(index))
    vf_g, af_g = flat_decode_scan(q, index._storage, pen,
                                  index.pq_codec.codebook_internal, **fkw)
    monkeypatch.setattr(config, "CODES_GATHER_BYTES", 1 << 31)
    flat_decode_scan._clear_cache()
    vf_s, af_s = flat_decode_scan(q, index._storage, pen,
                                  index.pq_codec.codebook_internal, **fkw)
    np.testing.assert_array_equal(np.asarray(af_g), np.asarray(af_s))
    np.testing.assert_allclose(np.asarray(vf_g), np.asarray(vf_s),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("distance", ["euclidean", "inner"])
def test_frozen_codes_search_matches_unfrozen(rng, distance):
    """freeze_codes packs storage rows into 128-lane tiles (the 100M-scale
    serving layout — any read of u8 [cap, m<128] storage otherwise re-lays
    the whole array into a lane-padded copy). Results must be identical,
    probed and flat, and mutation must be blocked while frozen."""
    index, x = _built(rng, n=2000, cache="none", distance=distance)  # g=16
    nq, k = 16, 8
    q = jnp.asarray(rng.normal(size=(nq, 32)).astype(np.float32)).T
    index.n_probe = 4
    index.scan_mode = "cell_major"
    v0, i0 = index.search(q, k=k)
    index.scan_mode = "flat"
    vf0, if0 = index.search(q, k=k)

    index.freeze_codes()
    assert index._frozen_codes
    assert index._storage.shape[1] == 128
    index.scan_mode = "cell_major"
    v1, i1 = index.search(q, k=k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-5, atol=1e-5)
    index.scan_mode = "flat"
    vf1, if1 = index.search(q, k=k)
    np.testing.assert_array_equal(np.asarray(if1), np.asarray(if0))
    np.testing.assert_allclose(np.asarray(vf1), np.asarray(vf0),
                               rtol=1e-5, atol=1e-5)

    with pytest.raises(RuntimeError):
        index.add(q)
    with pytest.raises(RuntimeError):
        index.remove(ids=jnp.arange(4))

    index.unfreeze_codes()
    assert not index._frozen_codes
    index.scan_mode = "cell_major"
    v2, i2 = index.search(q, k=k)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i0))
