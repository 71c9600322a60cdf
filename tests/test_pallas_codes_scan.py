"""Interpret-mode parity for the code-domain Pallas kernel: the
decode-in-kernel block scan (ops/pallas_codes_scan.py) must select the same
winners as the XLA one-hot path AND as the decoded-cache scan — the kernel's
candidates are bf16(codebook rows), bit-identical to a bf16 decoded cache.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.index.ivfpq import _coarse_probe
from torchpq_tpu.ops import adc
from torchpq_tpu.ops.onehot_adc import scan_cell_major_codes


def _built(rng, n=2000, d=32, m=8, n_cells=8, distance="euclidean"):
    x = rng.normal(size=(n, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       distance=distance, scan_cache_dtype="none",
                       initial_size=64)
    index.train(jnp.asarray(x.T))
    index.add(jnp.asarray(x.T))
    assert index.pack_group == 128 // m, "test expects packed-at-ingest"
    return index, x


def _probe(rng, index, nq, n_probe, d=32):
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
    _, cells, mask = _coarse_probe(
        q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
        n_probe=n_probe, use_smart=False, precision=None)
    return q, cells, mask


@pytest.mark.parametrize("distance", ["euclidean", "inner"])
def test_pallas_codes_exact_matches_xla(rng, distance):
    index, x = _built(rng, distance=distance)
    nq, n_probe, k = 13, 4, 6
    q, cells, mask = _probe(rng, index, nq, n_probe)
    args = (q, cells, mask, index._storage, index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity,
            index._scan_codebook)
    kw = dict(k=k, distance=distance, s_max=index.max_cell_capacity,
              n_cells=8, approx=False, m=index.code_size)
    v_x, a_x = scan_cell_major_codes(*args, impl="xla", **kw)
    v_p, a_p = scan_cell_major_codes(*args, impl="pallas", interpret=True,
                                     **kw)
    assert adc.LAST_GATE["impl"] == "pallas_codes"
    a_x, a_p = np.asarray(a_x), np.asarray(a_p)
    v_x, v_p = np.asarray(v_x), np.asarray(v_p)
    # the kernel scores bf16(decoded rows) while the XLA path sums bf16 LUT
    # entries — same math, different rounding: demand near-total agreement
    overlap = np.mean([len(set(a_p[i]) & set(a_x[i])) / k
                       for i in range(nq)])
    assert overlap >= 0.95, f"codes kernel vs xla overlap {overlap}"
    scale = max(1.0, float(np.abs(v_x[np.isfinite(v_x)]).max()))
    for i in range(nq):
        for a in set(a_p[i]) & set(a_x[i]) - {-1}:
            dv = abs(v_p[i][a_p[i] == a][0] - v_x[i][a_x[i] == a][0])
            assert dv <= 3e-2 * scale, (i, a, dv)


def test_pallas_codes_matches_decoded_cache_scan(rng):
    """Strong-form parity: the kernel's in-VMEM decode must equal a bf16
    decoded cache (one-hot row selection is exact), so its selection should
    match adc.scan_cell_major over bf16(decode(codes)) rows exactly."""
    index, x = _built(rng)
    nq, n_probe, k = 16, 4, 8
    q, cells, mask = _probe(rng, index, nq, n_probe)
    # reference: bf16 decoded cache built from the same codes
    live = index.storage_rows(jnp.arange(index.capacity))
    dec = index.pq_codec.decode_nd(live).astype(jnp.bfloat16)
    kw = dict(k=k, distance="euclidean", s_max=index.max_cell_capacity,
              n_cells=8, approx=False)
    v_d, a_d = adc.scan_cell_major(
        q, cells, mask, dec, index.aux("norm")[:, 0], index._is_empty,
        index._cell_start, index._cell_capacity, impl="xla", **kw)
    v_p, a_p = scan_cell_major_codes(
        q, cells, mask, index._storage, index.aux("norm")[:, 0],
        index._is_empty, index._cell_start, index._cell_capacity,
        index._scan_codebook, impl="pallas", interpret=True,
        m=index.code_size, **kw)
    a_d, a_p = np.asarray(a_d), np.asarray(a_p)
    np.testing.assert_array_equal(a_p, a_d)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_d),
                               rtol=1e-5, atol=1e-5)


def test_pallas_codes_approx_recall(rng):
    """Approx kernel (strided group reduce + pack32) over codes: winners
    must agree with the exact XLA path on nearly all addresses."""
    index, x = _built(rng, n=3000)
    assert index.max_cell_capacity >= 256, "needs the group-reduce path"
    nq, n_probe, k = 32, 4, 8
    q, cells, mask = _probe(rng, index, nq, n_probe)
    args = (q, cells, mask, index._storage, index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity,
            index._scan_codebook)
    kw = dict(k=k, distance="euclidean", s_max=index.max_cell_capacity,
              n_cells=8, m=index.code_size)
    v_x, a_x = scan_cell_major_codes(*args, approx=False, impl="xla", **kw)
    v_p, a_p = scan_cell_major_codes(*args, approx=True, impl="pallas",
                                     interpret=True, **kw)
    assert adc.LAST_GATE["impl"] == "pallas_codes" \
        and adc.LAST_GATE["pack32"]
    a_x, a_p = np.asarray(a_x), np.asarray(a_p)
    recall = np.mean([len(set(a_p[i]) & set(a_x[i])) / k
                      for i in range(nq)])
    assert recall >= 0.9, f"approx codes kernel recall {recall}"


def test_pallas_codes_end_to_end_search(rng):
    """index.search with scan_impl='pallas' (interpret) must keep
    self-recall on a packed code-domain index."""
    from torchpq_tpu import config
    index, x = _built(rng, n=1500)
    index.n_probe = 8
    index.scan_mode = "cell_major"
    ids = np.arange(len(x))
    old = config.PALLAS_INTERPRET
    config.PALLAS_INTERPRET = True
    try:
        index.scan_impl = "pallas"
        _, got = index.search(jnp.asarray(x[:64].T), k=1)
    finally:
        config.PALLAS_INTERPRET = old
        index.scan_impl = "auto"
    hit = (np.asarray(got)[:, 0] == ids[:64]).mean()
    assert hit >= 0.95, f"pallas codes end-to-end self-recall {hit}"
